package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Flac

/** The FLAC codec contract: LOSSLESS round-trips (encode → decode ==
  * input, bit-exact — fixed predictors + Rice residuals are pure integer
  * arithmetic), CRC-8/CRC-16 verification catches corruption by name,
  * stereo decorrelation / general LPC / 3–8 independent channels all
  * round-trip losslessly, malformed shapes (channel-count disagreement,
  * reserved subframe types, >8 channels) fail by name, and the
  * format-blind audio dispatch makes a FLAC re-encode of a WAV clip land
  * on the SAME energy-contour fingerprint — the cross-format audio dedup
  * case, mirroring the PNG↔GIF↔JPEG image story. FuzzSpec drives hostile
  * bytes separately. */
class FlacSpec extends AnyFunSuite {

  private def sweep(seed: Int, n: Int): Array[Int] =
    Array.tabulate(n)(p =>
      ((seed.toLong * 23 + p.toLong * p * 7 + p * 11) % 4096 - 2048).toInt)

  test("encode/decode round-trips bit-exactly across lengths and orders") {
    for (order <- 0 to 4; n <- Seq(17, 256, 300, 511, 1024)) {
      val in = sweep(order * 31 + n, n)
      val (ch, rate, out) = Flac.decode(1L, Flac.encode(in, order = order))
      assert(ch === 1 && rate === 16000)
      assert(out.toSeq === in.toSeq, s"order $order n $n")
    }
  }

  test("constant and mixed frames round-trip (CONSTANT subframe path)") {
    val const = Array.fill(300)(-1234)
    assert(Flac.decode(2L, Flac.encode(const))._3.toSeq === const.toSeq)
    // first frame constant, second frame a sweep
    val mixed = Array.fill(256)(77) ++ sweep(5, 100)
    assert(Flac.decode(3L, Flac.encode(mixed))._3.toSeq === mixed.toSeq)
    // extreme samples at the 16-bit rails
    val rails = Array.tabulate(64)(i => if (i % 2 == 0) -32768 else 32767)
    assert(Flac.decode(4L, Flac.encode(rails))._3.toSeq === rails.toSeq)
  }

  test("a FLAC re-encode of a WAV clip lands on the SAME audio fingerprint " +
    "(format-blind sample dispatch)") {
    import graft.multimodal.{MediaDedup, Multimodal}
    val samples = sweep(9, 570)
    val body = new Array[Byte](samples.length * 2)
    var p = 0
    while (p < samples.length) {
      body(2 * p) = (samples(p) & 0xFF).toByte
      body(2 * p + 1) = ((samples(p) >> 8) & 0xFF).toByte
      p += 1
    }
    val wav = Multimodal.Containers.wav(1, 16000, body)
    val flac = Flac.encode(samples)
    val (_, _, sWav) = Multimodal.pcm16Samples(10L, wav)
    val (_, _, sFlac) = Multimodal.pcm16Samples(11L, flac)
    assert(sWav.toSeq === sFlac.toSeq, "sample streams must be identical")
    // and therefore the contour fingerprints collide
    assert(MediaDedup.audioEnergies(10L, wav).toSeq ===
      MediaDedup.audioEnergies(11L, flac).toSeq)
  }

  test("STEREO round-trips bit-exactly through all three channel " +
    "assignments (mid/side, left/side, right/side, independent)") {
    val n = 300
    val inter = new Array[Int](2 * n)
    for (p <- 0 until n) {
      inter(2 * p) = ((p.toLong * 13 + 100) % 4096 - 2048).toInt
      inter(2 * p + 1) = ((p.toLong * 17 + 55) % 4096 - 2048).toInt
    }
    for (mode <- Seq(1, 8, 9, 10)) {
      val (ch, rate, out) =
        Flac.decode(30L + mode, Flac.encode(inter, channels = 2,
          stereoMode = mode))
      assert(ch === 2 && rate === 16000)
      assert(out.toSeq === inter.toSeq, s"stereo mode $mode")
    }
    // odd L+R sums exercise the mid/side low-bit reconstruction; rails too
    val hard = Array.tabulate(2 * 64)(i =>
      if (i % 4 == 0) -32768 else if (i % 4 == 1) 32767 else i * 7 % 255 - 127)
    for (mode <- Seq(8, 9, 10))
      assert(Flac.decode(40L + mode,
        Flac.encode(hard, channels = 2, stereoMode = mode))._3.toSeq ===
        hard.toSeq, s"rails mode $mode")
    // constant stereo: CONSTANT subframes on both the 16- and 17-bit path
    val const = Array.tabulate(2 * 80)(i => if (i % 2 == 0) -1000 else 333)
    for (mode <- Seq(1, 10))
      assert(Flac.decode(44L + mode,
        Flac.encode(const, channels = 2, stereoMode = mode))._3.toSeq ===
        const.toSeq)
  }

  test("general LPC subframes round-trip bit-exactly (mono and stereo)") {
    val in = sweep(3, 500)
    for ((coefs, shift) <- Seq((Array(3, -1), 1), (Array(2), 0),
      (Array(5, -4, 1), 2), (Array(1, 0, 0, -1, 1), 3))) {
      val (ch, _, out) = Flac.decode(50L,
        Flac.encode(in, lpc = Some((coefs, shift))))
      assert(ch === 1)
      assert(out.toSeq === in.toSeq,
        s"LPC coefs ${coefs.mkString(",")} shift $shift")
    }
    // stereo mid/side + LPC together — the real-world profile
    val inter = new Array[Int](2 * 300)
    for (p <- 0 until 300) {
      inter(2 * p) = ((p.toLong * p * 3 + p * 19) % 4096 - 2048).toInt
      inter(2 * p + 1) = ((p.toLong * p * 5 + p * 7 + 9) % 4096 - 2048).toInt
    }
    val bytes = Flac.encode(inter, channels = 2, stereoMode = 10,
      lpc = Some((Array(3, -1), 1)))
    assert(Flac.decode(51L, bytes)._3.toSeq === inter.toSeq)
  }

  test("MULTICHANNEL (3-8 independent channels) round-trips bit-exactly " +
    "through interleaved order") {
    for (nc <- Seq(3, 6, 8)) {
      val n = 120
      val inter = Array.tabulate(nc * n) { i =>
        val c = i % nc; val p = i / nc
        ((p.toLong * (7 + c * 5) + c * 999) % 4096 - 2048).toInt
      }
      val (ch, rate, out) = Flac.decode(60L + nc,
        Flac.encode(inter, channels = nc))
      assert(ch === nc && rate === 16000)
      assert(out.toSeq === inter.toSeq, s"channels $nc")
    }
  }

  test("corruption and out-of-scope shapes fail by NAME") {
    val ok = Flac.encode(sweep(7, 300))

    // flip a bit inside the first frame body: CRC must name it
    val corrupt = ok.clone()
    corrupt(ok.length - 10) = (corrupt(ok.length - 10) ^ 0x10).toByte
    val e1 = intercept[IllegalArgumentException](Flac.decode(20L, corrupt))
    assert(e1.getMessage.contains("CRC") || e1.getMessage.contains("media 20"),
      e1.getMessage)

    // STREAMINFO claiming stereo over mono frames: the frame's channel
    // assignment must disagree by name
    val stereo = ok.clone()
    stereo(20) = (stereo(20) | 0x02).toByte // channels-1: 0 -> 1
    val e2 = intercept[IllegalArgumentException](Flac.decode(21L, stereo))
    assert(e2.getMessage.contains("disagrees"), e2.getMessage)

    // a channel count disagreeing with the frames stays named (3 channels
    // declared over mono frames)
    val three = ok.clone()
    three(20) = ((three(20) & 0xF1) | 0x04).toByte // channels-1: 0 -> 2
    val e2b = intercept[IllegalArgumentException](Flac.decode(25L, three))
    assert(e2b.getMessage.contains("disagrees"), e2b.getMessage)

    // not FLAC at all
    val e3 = intercept[IllegalArgumentException](
      Flac.decode(22L, Array[Byte](1, 2, 3, 4, 5)))
    assert(e3.getMessage.contains("not a FLAC"))

    // truncation mid-frame
    val e4 = intercept[IllegalArgumentException](
      Flac.decode(23L, ok.take(ok.length - 5)))
    assert(e4.getMessage.contains("media 23"))

    // declared sample count beyond the decode bound fails by name
    // (STREAMINFO total-samples bits live in bytes 21..25 of the stream;
    // byte 21's HIGH nibble is the bps-1 low bits — keep it 0xF for 16-bit)
    val bomb = ok.clone()
    bomb(21) = 0xFF.toByte; bomb(22) = 0xFF.toByte; bomb(23) = 0xFF.toByte
    bomb(24) = 0xFF.toByte; bomb(25) = 0xFF.toByte
    val e5 = intercept[IllegalArgumentException](Flac.decode(24L, bomb))
    assert(e5.getMessage.contains("decode bound"))
  }
}
