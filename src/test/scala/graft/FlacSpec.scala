package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Flac

/** The FLAC codec contract: LOSSLESS round-trips (encode → decode ==
  * input, bit-exact — fixed predictors + Rice residuals are pure integer
  * arithmetic), CRC-8/CRC-16 verification catches corruption by name,
  * out-of-scope shapes (stereo, LPC) fail by name, and the format-blind
  * audio dispatch makes a FLAC re-encode of a WAV clip land on the SAME
  * energy-contour fingerprint — the cross-format audio dedup case,
  * mirroring the PNG↔GIF↔JPEG image story. FuzzSpec drives hostile bytes
  * separately. */
class FlacSpec extends AnyFunSuite {

  private def sweep(seed: Int, n: Int): Array[Int] =
    Array.tabulate(n)(p =>
      ((seed.toLong * 23 + p.toLong * p * 7 + p * 11) % 4096 - 2048).toInt)

  test("encode/decode round-trips bit-exactly across lengths and orders") {
    for (order <- 0 to 4; n <- Seq(17, 256, 300, 511, 1024)) {
      val in = sweep(order * 31 + n, n)
      val (rate, out) = Flac.decode(1L, Flac.encode(in, order = order))
      assert(rate === 16000)
      assert(out.toSeq === in.toSeq, s"order $order n $n")
    }
  }

  test("constant and mixed frames round-trip (CONSTANT subframe path)") {
    val const = Array.fill(300)(-1234)
    assert(Flac.decode(2L, Flac.encode(const))._2.toSeq === const.toSeq)
    // first frame constant, second frame a sweep
    val mixed = Array.fill(256)(77) ++ sweep(5, 100)
    assert(Flac.decode(3L, Flac.encode(mixed))._2.toSeq === mixed.toSeq)
    // extreme samples at the 16-bit rails
    val rails = Array.tabulate(64)(i => if (i % 2 == 0) -32768 else 32767)
    assert(Flac.decode(4L, Flac.encode(rails))._2.toSeq === rails.toSeq)
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

  test("corruption and out-of-scope shapes fail by NAME") {
    val ok = Flac.encode(sweep(7, 300))

    // flip a bit inside the first frame body: CRC must name it
    val corrupt = ok.clone()
    corrupt(ok.length - 10) = (corrupt(ok.length - 10) ^ 0x10).toByte
    val e1 = intercept[IllegalArgumentException](Flac.decode(20L, corrupt))
    assert(e1.getMessage.contains("CRC") || e1.getMessage.contains("media 20"),
      e1.getMessage)

    // stereo STREAMINFO (patch channels-1 bits at byte 4+4+12 = byte 20)
    val stereo = ok.clone()
    stereo(20) = (stereo(20) | 0x02).toByte // channels-1: 0 -> 1
    val e2 = intercept[IllegalArgumentException](Flac.decode(21L, stereo))
    assert(e2.getMessage.contains("mono"))

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
