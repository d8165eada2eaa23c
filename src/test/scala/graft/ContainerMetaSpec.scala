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

  test("ID3v2 extended headers are skipped by their version's size layout " +
    "and unsynchronisation is reversed (whole-tag v2.3, per-frame v2.4)") {
    // "ÿ" in UTF-16 text guarantees real 0xFF bytes, so the unsync
    // scheme is genuinely exercised, not vacuously green
    val frames = Seq("TIT2" -> "tÿ1", "TPE1" -> "aÿb",
      "TALB" -> "alÿ", "TCON" -> "gÿ")
    for (v4 <- Seq(true, false); ext <- Seq(false, true);
         uns <- Seq(false, true); pad <- Seq(0, 16)) {
      val p = ContainerMeta.mp3StubTagged(frames, v4, padding = pad,
        extHeader = ext, unsync = uns)
      assert(ContainerMeta.id3TextFrames(9L, p) === frames,
        s"v4=$v4 ext=$ext uns=$uns pad=$pad")
      // the MPEG frame behind the tag still parses (syncsafe skip holds)
      assert(ContainerMeta.mp3Meta(9L, p).sampleRate === 44100,
        s"v4=$v4 ext=$ext uns=$uns pad=$pad")
    }
    // hostile extended-header sizes fail by name
    val bad4 = ContainerMeta.mp3StubTagged(frames, v4 = true, extHeader = true)
    bad4(10) = 0x7F // syncsafe ext size far past the tag
    val e1 = intercept[IllegalArgumentException](
      ContainerMeta.id3TextFrames(9L, bad4))
    assert(e1.getMessage.contains("extended header size"), e1.getMessage)
    val bad3 = ContainerMeta.mp3StubTagged(frames, v4 = false, extHeader = true)
    bad3(10) = 0x7F // plain ext size overruns the tag
    val e2 = intercept[IllegalArgumentException](
      ContainerMeta.id3TextFrames(9L, bad3))
    assert(e2.getMessage.contains("overruns the tag"), e2.getMessage)
    // compressed/encrypted text frames fail by name (v2.3 byte layout)
    val comp = ContainerMeta.mp3StubTagged(Seq("TIT2" -> "A"), v4 = false)
    comp(19) = 0x80.toByte // v2.3 frame format flags: compression
    val e3 = intercept[IllegalArgumentException](
      ContainerMeta.id3TextFrames(9L, comp))
    assert(e3.getMessage.contains("compressed/encrypted"), e3.getMessage)
  }

  test("hostile version-1 mvhd duration fails by name instead of " +
    "overflowing the millisecond conversion") {
    // hand-build ftyp + moov(mvhd v1) with duration 2^62 (be() max range)
    def be(v: Long, n: Int): Array[Byte] =
      Array.tabulate(n)(i => ((v >> (8 * (n - 1 - i))) & 0xFF).toByte)
    def box(t: String, b: Array[Byte]): Array[Byte] =
      be(8L + b.length, 4) ++ t.getBytes("US-ASCII") ++ b
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be(0, 4))
    val mvhd = box("mvhd", Array[Byte](1, 0, 0, 0) ++ be(0, 8) ++ be(0, 8) ++
      be(1000, 4) ++ be(1L << 62, 8) ++ new Array[Byte](80))
    val e = intercept[IllegalArgumentException](
      ContainerMeta.mp4Meta(7L, ftyp ++ box("moov", mvhd)))
    assert(e.getMessage.contains("overflows the millisecond conversion"),
      e.getMessage)
  }

  test("Ogg comment headers parse for Vorbis and Opus, uppercase field " +
    "names, and reassemble packets across pages") {
    val comments = Seq("Title" -> "Some Song", "ARTIST" -> "A Band",
      "genre" -> "ambient")
    val expect = Seq("TITLE" -> "Some Song", "ARTIST" -> "A Band",
      "GENRE" -> "ambient")
    val v = ContainerMeta.oggVorbisTaggedStub(2, 44100, comments)
    assert(ContainerMeta.oggTextComments(1L, v) === expect)
    // the id/page walk still reads the same stream
    assert(ContainerMeta.oggMeta(1L, v).codec === "vorbis")
    val o = ContainerMeta.oggOpusTaggedStub(1, 48000, comments)
    assert(ContainerMeta.oggTextComments(1L, o) === expect)
    // a >255-byte comment packet spanning TWO pages (lacing-255
    // continuation + headerType 0x01) reassembles
    val long = comments :+ ("DESCRIPTION" -> ("y" * 400))
    for (mk <- Seq(
      ContainerMeta.oggVorbisTaggedStub(2, 44100, long, spanPages = true),
      ContainerMeta.oggOpusTaggedStub(2, 48000, long, spanPages = true))) {
      assert(ContainerMeta.oggTextComments(2L, mk) ===
        expect :+ ("DESCRIPTION" -> ("y" * 400)))
      assert(ContainerMeta.oggMeta(2L, mk).nPages === 4)
    }
    // untagged stubs (id header + noise page only) fail by name: the
    // "comment" packet is audio noise, not a recognized header
    val e0 = intercept[IllegalArgumentException](
      ContainerMeta.oggTextComments(3L, ContainerMeta.oggVorbisStub(1, 8000)))
    assert(e0.getMessage.contains("unrecognized Ogg comment header"),
      e0.getMessage)
    // hostile comment count fails by name
    val evil = ContainerMeta.oggVorbisTaggedStub(1, 8000, comments)
    // comment count u32le sits after 0x03"vorbis" + vendor(4+13) in pkt 2;
    // page 2 body starts at page2_off + 27 + 1
    val p2 = evil.indexOfSlice("OggS".getBytes("US-ASCII"), 4)
    val cntOff = p2 + 28 + 7 + 4 + 13
    evil(cntOff + 3) = 0x7F // -> huge LE count
    val e1 = intercept[IllegalArgumentException](
      ContainerMeta.oggTextComments(3L, evil))
    assert(e1.getMessage.contains("exceeds 1024") ||
      e1.getMessage.contains("truncated Ogg comment"), e1.getMessage)
  }

  test("MP4 ilst text tags parse from the udta/meta/ilst spine (meta is " +
    "a FullBox) and absence is data") {
    val tags = Seq("title" -> "A Film", "artist" -> "Someone",
      "album" -> "Collection")
    val p = ContainerMeta.mp4Stub("mp42", 600, 1200,
      Seq(TrackMeta("vide", "avc1", 640, 360, 0, 0)), tags = tags)
    assert(ContainerMeta.mp4TextTags(1L, p) === tags)
    // the metadata walk is undisturbed by the udta subtree
    val m = ContainerMeta.mp4Meta(1L, p)
    assert(m.durationMs === 2000L && m.tracks.head.codec === "avc1")
    // a container without an ilst returns empty
    val bare = ContainerMeta.mp4Stub("isom", 1000, 100,
      Seq(TrackMeta("vide", "avc1", 64, 48, 0, 0)))
    assert(ContainerMeta.mp4TextTags(1L, bare) === Seq.empty)
    // hostile data-atom size fails by name
    val evil = p.clone()
    val ilst = evil.indexOfSlice("ilst".getBytes("US-ASCII"))
    // first tag atom starts at ilst+4; its data child size at +8
    evil(ilst + 4 + 8) = 0x7F
    val e = intercept[IllegalArgumentException](
      ContainerMeta.mp4TextTags(1L, evil))
    assert(e.getMessage.contains("overruns") ||
      e.getMessage.contains("truncated"), e.getMessage)
  }

  test("HEIF brands surface as image formats with ispe dims") {
    val heic = ContainerMeta.heifStub("heic", 4032, 3024)
    val avif = ContainerMeta.heifStub("avif", 1920, 1080)
    assert(ContainerMeta.heifFormat(heic) === Some("heic"))
    assert(ContainerMeta.heifFormat(avif) === Some("avif"))
    assert(ContainerMeta.heifDims(1L, heic) === Some((4032, 3024)))
    assert(ContainerMeta.heifDims(1L, avif) === Some((1920, 1080)))
    // a video MP4 is NOT a HEIF still, and has no ispe
    val mp4 = ContainerMeta.mp4Stub("isom", 1000, 100,
      Seq(TrackMeta("vide", "avc1", 64, 48, 0, 0)))
    assert(ContainerMeta.heifFormat(mp4) === None)
    assert(ContainerMeta.heifDims(1L, mp4) === None)
    // truncated ispe fails by name
    val evil = heic.clone()
    val ispe = evil.indexOfSlice("ispe".getBytes("US-ASCII"))
    val cut = evil.take(ispe + 8) // chop inside the ispe body
    val e = intercept[IllegalArgumentException](
      ContainerMeta.heifDims(1L, cut))
    assert(e.getMessage.contains("truncated"), e.getMessage)
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
