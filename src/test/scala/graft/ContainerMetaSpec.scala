package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.ContainerMeta
import graft.multimodal.ContainerMeta.TrackMeta

/** MP4/MP3/Ogg metadata walks: round-trips against the in-repo stub
  * encoders (every field earned through the real box/frame/page walk),
  * the version-split and ID3/largesize edge layouts, and the
  * named-failure surface for hostile sizes. */
class ContainerMetaSpec extends AnyFunSuite {

  test("MP4 box walk reads brand, duration, and per-track metadata") {
    val p = ContainerMeta.mp4Stub("isom", 1000, 7400, Seq(
      TrackMeta("vide", "avc1", 1920, 1080, 0, 0),
      TrackMeta("soun", "mp4a", 0, 0, 2, 44100)))
    val m = ContainerMeta.mp4Meta(5L, p)
    assert(m.brand === "isom")
    assert(m.durationMs === 7400L)
    assert(m.tracks === Seq(
      TrackMeta("vide", "avc1", 1920, 1080, 0, 0),
      TrackMeta("soun", "mp4a", 0, 0, 2, 44100)))
  }

  test("MP4 duration scales by the mvhd timescale") {
    val p = ContainerMeta.mp4Stub("mp42", 600, 1234,
      Seq(TrackMeta("vide", "hev1", 640, 360, 0, 0)))
    assert(ContainerMeta.mp4Meta(6L, p).durationMs === 1234L * 1000 / 600)
  }

  test("MP4 hostile sizes fail by name, never loop or index-crash") {
    val ok = ContainerMeta.mp4Stub("isom", 1000, 100,
      Seq(TrackMeta("vide", "avc1", 64, 48, 0, 0)))
    // box size smaller than its header
    val tiny = ok.clone(); tiny(3) = 4
    val e1 = intercept[IllegalArgumentException](ContainerMeta.mp4Meta(1L, tiny))
    assert(e1.getMessage.contains("smaller than its header"), e1.getMessage)
    // box size overrunning the payload
    val over = ok.clone(); over(0) = 0x7F
    val e2 = intercept[IllegalArgumentException](ContainerMeta.mp4Meta(1L, over))
    assert(e2.getMessage.contains("truncated"), e2.getMessage)
    // ftyp alone (no moov/mvhd): the walk itself is fine, the census fails
    val e3 = intercept[IllegalArgumentException](
      ContainerMeta.mp4Meta(1L, ok.take(20)))
    assert(e3.getMessage.contains("without an mvhd"), e3.getMessage)
  }

  test("MP3 frame headers parse across the version/layer/rate tables") {
    // MPEG1 Layer III, 128 kbps (idx 9), 44100 (idx 0), stereo
    val m1 = ContainerMeta.mp3Meta(2L,
      ContainerMeta.mp3Stub(3, 1, 9, 0, mono = false, id3Size = 0))
    assert(m1 === ContainerMeta.Mp3Meta("mpeg1", 3, 128, 44100, 2))
    // MPEG2 Layer III, idx 9 -> 80 kbps, 24000 (idx 1), mono
    val m2 = ContainerMeta.mp3Meta(2L,
      ContainerMeta.mp3Stub(2, 1, 9, 1, mono = true, id3Size = 0))
    assert(m2 === ContainerMeta.Mp3Meta("mpeg2", 3, 80, 24000, 1))
    // MPEG1 Layer I, idx 9 -> 288 kbps, 32000 (idx 2)
    val m3 = ContainerMeta.mp3Meta(2L,
      ContainerMeta.mp3Stub(3, 3, 9, 2, mono = false, id3Size = 0))
    assert(m3 === ContainerMeta.Mp3Meta("mpeg1", 1, 288, 32000, 2))
  }

  test("ID3v2 tags skip by their syncsafe size (incl. >127-byte tags)") {
    for (tag <- Seq(1, 127, 128, 300, 5000)) {
      val m = ContainerMeta.mp3Meta(3L,
        ContainerMeta.mp3Stub(3, 1, 5, 0, mono = true, id3Size = tag))
      assert(m === ContainerMeta.Mp3Meta("mpeg1", 3, 64, 44100, 1), s"tag=$tag")
    }
    // a tag size that points past the payload end fails by name
    val evil = ContainerMeta.mp3Stub(3, 1, 5, 0, mono = true, id3Size = 50)
      .take(40)
    val e = intercept[IllegalArgumentException](ContainerMeta.mp3Meta(3L, evil))
    assert(e.getMessage.contains("truncates"), e.getMessage)
  }

  test("Ogg page walk reads the Vorbis and Opus identification headers") {
    val v = ContainerMeta.oggMeta(4L, ContainerMeta.oggVorbisStub(2, 44100))
    assert(v === ContainerMeta.OggMeta("vorbis", 2, 44100, 2))
    val o = ContainerMeta.oggMeta(4L, ContainerMeta.oggOpusStub(1, 48000))
    assert(o === ContainerMeta.OggMeta("opus", 1, 48000, 2))
  }

  test("Ogg hostile pages fail by name") {
    val ok = ContainerMeta.oggVorbisStub(1, 8000)
    // second page loses capture sync
    val bad = ok.clone()
    val second = ok.indexOfSlice("OggS".getBytes("US-ASCII"), 4)
    bad(second) = 'X'.toByte
    val e1 = intercept[IllegalArgumentException](ContainerMeta.oggMeta(1L, bad))
    assert(e1.getMessage.contains("capture sync") ||
      e1.getMessage.contains("tile"), e1.getMessage)
    // unknown identification packet
    val unk = ok.clone(); unk(28 + 1) = 'x'.toByte
    val e2 = intercept[IllegalArgumentException](ContainerMeta.oggMeta(1L, unk))
    assert(e2.getMessage.contains("unrecognized Ogg codec"), e2.getMessage)
  }

  test("ID3v2 text frames parse in both size layouts and all four " +
    "declared encodings; non-text frames and padding are skipped") {
    val frames = Seq("TIT2" -> "My Title", "TPE1" -> "Some Artist",
      "TALB" -> "An Album", "TCON" -> "genre x", "TRCK" -> "7")
    for (v4 <- Seq(true, false); pad <- Seq(0, 1, 64)) {
      val p = ContainerMeta.mp3StubTagged(frames, v4, padding = pad)
      assert(ContainerMeta.id3TextFrames(1L, p) === frames, s"v4=$v4 pad=$pad")
      // the frame-header walk still reads the MPEG frame behind the tag
      assert(ContainerMeta.mp3Meta(1L, p).sampleRate === 44100)
    }
    // a non-text frame (PRIV) between text frames is skipped by size
    val tagged = ContainerMeta.mp3StubTagged(Seq("TIT2" -> "A"), v4 = true)
    val priv = {
      // splice a PRIV frame before TIT2: rebuild the tag by hand
      val body = new java.io.ByteArrayOutputStream()
      body.write("PRIV".getBytes("US-ASCII"))
      body.write(Array[Byte](0, 0, 0, 5)); body.write(0); body.write(0)
      body.write(Array[Byte](1, 2, 3, 4, 5))
      body.write("TIT2".getBytes("US-ASCII"))
      body.write(Array[Byte](0, 0, 0, 2)); body.write(0); body.write(0)
      body.write(0); body.write('A')
      val tag = body.toByteArray
      val out = new java.io.ByteArrayOutputStream()
      out.write("ID3".getBytes("US-ASCII")); out.write(4); out.write(0)
      out.write(0)
      val n = tag.length
      out.write(Array[Byte](((n >> 21) & 0x7F).toByte,
        ((n >> 14) & 0x7F).toByte, ((n >> 7) & 0x7F).toByte, (n & 0x7F).toByte))
      out.write(tag, 0, tag.length)
      out.toByteArray
    }
    assert(ContainerMeta.id3TextFrames(2L, priv) === Seq("TIT2" -> "A"))
    assert(tagged.nonEmpty)
    // untagged payloads contribute nothing; hostile frame sizes by name
    assert(ContainerMeta.id3TextFrames(3L,
      ContainerMeta.mp3Stub(3, 1, 9, 0, mono = false, id3Size = 0)) === Seq())
    val evil = ContainerMeta.mp3StubTagged(Seq("TIT2" -> "A"), v4 = false)
    evil(14) = 0x7F // v2.3 frame size high byte -> overruns the tag
    val e = intercept[IllegalArgumentException](
      ContainerMeta.id3TextFrames(4L, evil))
    assert(e.getMessage.contains("truncated ID3v2 frame"), e.getMessage)
  }

  test("magic detectors are mutually exclusive on the stub fixtures") {
    val mp4 = ContainerMeta.mp4Stub("isom", 1000, 10,
      Seq(TrackMeta("vide", "avc1", 8, 8, 0, 0)))
    val mp3 = ContainerMeta.mp3Stub(3, 1, 9, 0, mono = false, id3Size = 0)
    val ogg = ContainerMeta.oggOpusStub(2, 48000)
    assert(ContainerMeta.isMp4(mp4) && !ContainerMeta.isMp3(mp4) &&
      !ContainerMeta.isOgg(mp4))
    assert(ContainerMeta.isMp3(mp3) && !ContainerMeta.isMp4(mp3) &&
      !ContainerMeta.isOgg(mp3))
    assert(ContainerMeta.isOgg(ogg) && !ContainerMeta.isMp4(ogg) &&
      !ContainerMeta.isMp3(ogg))
  }
}
