package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Webp
import graft.multimodal.Webp.LosslessOptions

/** VP8L round-trip symmetry across the full decoder-path matrix: the JDK
  * has no WebP codec to cross-pin against (unlike PNG/GIF/JPEG), so
  * exactness rests on (a) closed-form planted pixels in the oracle rows
  * and (b) these encode→decode identities over every transform, cache,
  * LZ77, simple-code, and meta-prefix path. */
class WebpSpec extends AnyFunSuite {

  private def grayArgb(w: Int, h: Int, f: (Int, Int) => Int): Array[Int] =
    Array.tabulate(w * h) { k =>
      val g = f(k % w, k / w) & 0xFF
      0xFF000000 | (g << 16) | (g << 8) | g
    }

  private def colorArgb(w: Int, h: Int, fr: (Int, Int) => Int,
                        fg: (Int, Int) => Int, fb: (Int, Int) => Int,
                        fa: (Int, Int) => Int = (_, _) => 255): Array[Int] =
    Array.tabulate(w * h) { k =>
      val x = k % w; val y = k / w
      ((fa(x, y) & 0xFF) << 24) | ((fr(x, y) & 0xFF) << 16) |
        ((fg(x, y) & 0xFF) << 8) | (fb(x, y) & 0xFF)
    }

  private def roundTrip(label: String, w: Int, h: Int, argb: Array[Int],
                        opts: LosslessOptions): Unit = {
    val payload = Webp.encodeLossless(w, h, argb, opts)
    val (dw, dh, rgba) = Webp.decodeWebpRgba(7L, payload)
    assert(dw == w && dh == h, s"$label: dims $dw x $dh != $w x $h")
    var k = 0
    while (k < w * h) {
      val expected = argb(k)
      val got = ((rgba(4 * k + 3) & 0xFF) << 24) |
        ((rgba(4 * k) & 0xFF) << 16) | ((rgba(4 * k + 1) & 0xFF) << 8) |
        (rgba(4 * k + 2) & 0xFF)
      assert(got == expected,
        s"$label: pixel $k got ${got.toHexString} want ${expected.toHexString}")
      k += 1
    }
  }

  private def planted(x: Int, y: Int): Int =
    (x * x * 7 + y * y * 11 + x * y * 5 + 13) % 256

  test("plain literal round-trip across dimensions") {
    for ((w, h) <- Seq((1, 1), (1, 7), (7, 1), (16, 16), (21, 13)))
      roundTrip(s"plain $w x $h", w, h, grayArgb(w, h, planted),
        LosslessOptions())
  }

  test("RGBA content with a real alpha channel round-trips") {
    val (w, h) = (17, 11)
    roundTrip("rgba", w, h, colorArgb(w, h,
      (x, y) => x * 13 + y * 7, (x, y) => x * 3 + y * 19 + 40,
      (x, y) => x * 29 + y + 90, (x, y) => 200 + (x + y) % 56),
      LosslessOptions())
  }

  test("subtract-green transform round-trips") {
    roundTrip("subtract-green", 19, 14, grayArgb(19, 14, planted),
      LosslessOptions(subtractGreen = true))
    roundTrip("subtract-green color", 19, 14, colorArgb(19, 14,
      (x, y) => x * 11 + y, (x, y) => x + y * 17, (x, y) => x * 5 + y * 3),
      LosslessOptions(subtractGreen = true))
  }

  test("color-indexing round-trips at every bundling width") {
    // palette sizes 2 / 3 / 4 / 5 / 16 / 17 exercise pack widths 8, 4, 4,
    // 2, 2 pixels per byte and the unbundled >16 path, with widths not
    // divisible by the pack factor (partial trailing byte per row)
    for (n <- Seq(2, 3, 4, 5, 16, 17)) {
      val (w, h) = (13, 9)
      val img = grayArgb(w, h, (x, y) => ((x * 7 + y * 5 + x * y) % n) * (255 / n))
      roundTrip(s"palette n<=$n", w, h, img, LosslessOptions(palette = true))
    }
  }

  test("all 14 predictor modes round-trip") {
    for (mode <- 0 to 13) {
      roundTrip(s"predictor $mode", 21, 17, grayArgb(21, 17, planted),
        LosslessOptions(predictorMode = mode, predictorBits = 3))
      roundTrip(s"predictor $mode color", 12, 10, colorArgb(12, 10,
        (x, y) => x * 37 + y * 3, (x, y) => 255 - x * 5 - y * 7,
        (x, y) => x * x + y), LosslessOptions(predictorMode = mode))
    }
  }

  test("cross-color transform round-trips, signed multipliers") {
    for ((g2r, g2b, r2b) <- Seq((16, -24, 5), (-128, 127, -64), (0, 0, 0)))
      roundTrip(s"color-transform ($g2r,$g2b,$r2b)", 18, 12,
        colorArgb(18, 12, (x, y) => x * 19 + y * 2, (x, y) => x + y * 13,
          (x, y) => x * 3 + y * 29),
        LosslessOptions(colorTransform = Some((g2r, g2b, r2b))))
  }

  test("color cache + LZ77 row copies round-trip") {
    // rows duplicated in pairs → dist-w copies; coarse value quantization
    // → recurring colors for cache hits
    val (w, h) = (20, 16)
    val img = grayArgb(w, h, (x, y) => ((x * 5 + (y - y % 2) * 7) % 16) * 16)
    roundTrip("cache+lz77", w, h, img,
      LosslessOptions(cacheBits = 6, lz77 = true))
    roundTrip("cache only", w, h, img, LosslessOptions(cacheBits = 4))
    roundTrip("lz77 only", w, h, img, LosslessOptions(lz77 = true))
  }

  test("meta prefix-code tiling (two groups) round-trips") {
    roundTrip("meta", 24, 18, grayArgb(24, 18, planted),
      LosslessOptions(metaBits = 3))
    roundTrip("meta+cache", 24, 18, grayArgb(24, 18, (x, y) => (x * 4) % 256),
      LosslessOptions(metaBits = 2, cacheBits = 5))
  }

  test("stacked transforms: subtract-green then predictor") {
    roundTrip("sg+pred", 16, 16, grayArgb(16, 16, planted),
      LosslessOptions(subtractGreen = true, predictorMode = 7))
  }

  test("VP8X extended container wraps a decodable VP8L stream") {
    val img = grayArgb(10, 8, planted)
    val plain = Webp.encodeLossless(10, 8, img, LosslessOptions())
    val wrapped = Webp.wrapVp8x(plain, 10, 8)
    val (w, h, rgba) = Webp.decodeWebpRgba(3L, wrapped)
    assert(w == 10 && h == 8)
    assert((rgba(0) & 0xFF) == (planted(0, 0) & 0xFF))
  }

  test("lossy VP8 decodes through the still seam (r15); a header-only " +
    "stub with a garbage body and animated WebP fail by name") {
    // the real thing decodes (Vp8Spec pins exactness; this pins routing)
    val real = graft.multimodal.Vp8Enc.encodeCellGrayWebp(32, 32,
      Array.tabulate(64)(k => ((k * 5 + 9) % 54) * 4 + 16))
    val (rw, rh, _) = Webp.decodeWebpRgba(5L, real)
    assert(rw == 32 && rh == 32)
    // the dimension-stub's fake body is hostile bytes to the bool
    // decoder: arithmetic coding can read garbage as a "valid" stream
    // (bounded garbage pixels) — the contract is decode-or-NAMED, never
    // an index error or unbounded loop
    val lossy = Webp.lossyVp8Stub(64, 48, 120)
    try { Webp.decodeWebpRgba(5L, lossy); () }
    catch {
      case e: IllegalArgumentException =>
        assert(e.getMessage.startsWith("media 5:"), e.getMessage)
    }
    // hand-build an ANIM chunk container
    val anim = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("RIFF".getBytes("US-ASCII"))
      out.write(Array[Byte](20, 0, 0, 0))
      out.write("WEBPANIM".getBytes("US-ASCII"))
      out.write(Array[Byte](6, 0, 0, 0))
      out.write(Array[Byte](0, 0, 0, 0, 0, 0))
      out.toByteArray
    }
    val e2 = intercept[IllegalArgumentException](Webp.decodeWebpRgba(6L, anim))
    assert(e2.getMessage.contains("animated WebP"))
  }

  test("uniform-histogram content (every Huffman length equal) round-trips " +
    "— the 0-bit code-length-code regression") {
    // 256 near-uniform symbol frequencies give every literal length 8, so
    // the code-length code has ONE used symbol: the stream declares it at
    // length 1 but a single-used-symbol prefix code reads as ZERO bits —
    // the encoder originally emitted the declared 1-bit codes and desynced
    // (found by the q276 fixture, g=42: v = (22 + 216x + 235y) mod 256
    // over 20x16)
    val (w, h) = (20, 16)
    roundTrip("uniform-histogram", w, h,
      grayArgb(w, h, (x, y) => (22 + 216 * x + 235 * y) % 256),
      LosslessOptions())
  }

  test("animated WebP: full-canvas no-blend frames round-trip exactly") {
    val (w, h) = (10, 8)
    val srcs = (0 until 3).map(f => grayArgb(w, h, (x, y) => planted(x, y) + f * 3))
    val payload = Webp.encodeAnimated(w, h, 0xFF000000,
      srcs.map(a => Webp.AnimFrameSpec(0, 0, w, h, a)))
    val (dw, dh, frames) = Webp.decodeAnimFrames(8L, payload)
    assert(dw == w && dh == h && frames.length == 3)
    for (f <- 0 until 3; k <- 0 until w * h) {
      val want = srcs(f)(k) & 0xFF
      assert((frames(f)(3 * k) & 0xFF) == want, s"frame $f pixel $k")
      assert((frames(f)(3 * k + 1) & 0xFF) == want)
      assert((frames(f)(3 * k + 2) & 0xFF) == want)
    }
  }

  test("animated WebP canvas algebra: blend punch-through, no-blend " +
    "replace, dispose-to-background") {
    // 4x4 canvas, bg gray 10. Frame 0: full opaque 50s, dispose AFTER.
    // Frame 1: 2x2 rect at (2,2), BLEND, one alpha-0 pixel -> shows the
    // DISPOSED background, others opaque 200.
    // Frame 2: 2x2 rect at (0,0), NO-BLEND with one alpha-0 pixel -> that
    // pixel becomes the background, not the prior canvas.
    val f0 = Array.fill(16)(0xFF000000 | 0x323232) // 50
    val f1 = Array.tabulate(4)(k =>
      if (k == 0) 0 else 0xFF000000 | 0xC8C8C8) // alpha 0, then 200s
    val f2 = Array.tabulate(4)(k =>
      if (k == 3) 0 else 0xFF000000 | 0x646464) // 100s, last alpha 0
    val payload = Webp.encodeAnimated(4, 4, 0xFF000000 | 0x0A0A0A, Seq(
      Webp.AnimFrameSpec(0, 0, 4, 4, f0, noBlend = true, dispose = true),
      Webp.AnimFrameSpec(2, 2, 2, 2, f1, noBlend = false),
      Webp.AnimFrameSpec(0, 0, 2, 2, f2, noBlend = true)))
    val (_, _, frames) = Webp.decodeAnimFrames(9L, payload)
    def px(f: Int, x: Int, y: Int): Int = frames(f)(3 * (y * 4 + x)) & 0xFF
    assert(px(0, 0, 0) == 50 && px(0, 3, 3) == 50)
    // after dispose, canvas is bg(10); blend rect at (2,2): pixel (2,2)
    // is the alpha-0 punch-through -> 10, (3,2)/(2,3)/(3,3) -> 200
    assert(px(1, 0, 0) == 10, "disposed base")
    assert(px(1, 2, 2) == 10, "alpha-0 blend keeps canvas")
    assert(px(1, 3, 2) == 200 && px(1, 2, 3) == 200 && px(1, 3, 3) == 200)
    // frame 2 keeps frame 1's canvas outside its rect; inside, no-blend
    // writes 100s except the alpha-0 pixel (1,1) -> background 10
    assert(px(2, 2, 2) == 10 && px(2, 3, 2) == 200)
    assert(px(2, 0, 0) == 100 && px(2, 1, 0) == 100 && px(2, 0, 1) == 100)
    assert(px(2, 1, 1) == 10, "alpha-0 no-blend restores background")
  }

  test("animated WebP failures are named: lossy frame, oversized rect, " +
    "missing frames, volume bound") {
    val ok = Webp.encodeAnimated(8, 8, 0xFF000000,
      Seq(Webp.AnimFrameSpec(0, 0, 8, 8, grayArgb(8, 8, planted))))
    // not animated
    val still = Webp.encodeLossless(8, 8, grayArgb(8, 8, planted))
    val e1 = intercept[IllegalArgumentException](Webp.decodeAnimFrames(4L, still))
    assert(e1.getMessage.contains("ANIM flag"))
    // truncation
    val e2 = intercept[IllegalArgumentException](
      Webp.decodeAnimFrames(4L, ok.take(40)))
    assert(e2.getMessage.startsWith("media 4:"))
    // VP8X+ANIM but no ANMF
    val e3 = intercept[IllegalArgumentException](
      Webp.decodeAnimFrames(4L, ok.take(42)))
    assert(e3.getMessage.startsWith("media 4:"), e3.getMessage)
    // rect exceeding the canvas: patch the ANMF width field
    val bad = ok.clone()
    val anmf = ok.indexOfSlice("ANMF".getBytes("US-ASCII"))
    bad(anmf + 8 + 6) = 0x40 // frame width-1 low byte -> 65
    val e4 = intercept[IllegalArgumentException](Webp.decodeAnimFrames(4L, bad))
    assert(e4.getMessage.contains("exceeds the 8x8 canvas") ||
      e4.getMessage.contains("truncated") ||
      e4.getMessage.contains("declares"), e4.getMessage)
    // hostile canvas dims hit the decode bound
    val big = ok.clone()
    big(24) = 0xFF.toByte; big(25) = 0xFF.toByte; big(26) = 0xFF.toByte
    val e5 = intercept[IllegalArgumentException](Webp.decodeAnimFrames(4L, big))
    assert(e5.getMessage.contains("decode bound"), e5.getMessage)
  }

  test("EXIF chunk orientation: parsed from the VP8X layout, applied as " +
    "the displayed image; hostile bytes degrade to 0, never throw") {
    val img = grayArgb(10, 8, planted)
    val plain = Webp.encodeLossless(10, 8, img)
    assert(Webp.exifOrientation(plain) === 0)
    for (o <- 1 to 8) {
      val tagged = Webp.withExif(plain, 10, 8, o)
      assert(Webp.exifOrientation(tagged) === o, s"o=$o")
      // the VP8L stream still decodes through the extended container
      val (w, h, rgba) = Webp.decodeWebpRgba(12L, tagged)
      assert(w == 10 && h == 8)
      // displayed form: orientRgba matches the published table
      val (dw, dh, disp) = Webp.orientRgba(w, h, rgba, o)
      if (o >= 5) assert(dw == 8 && dh == 10) else assert(dw == 10 && dh == 8)
      val (sx, sy) = o match {
        case 1 => (0, 0); case 2 => (9, 0); case 3 => (9, 7); case 4 => (0, 7)
        case 5 => (0, 0); case 6 => (0, 7); case 7 => (9, 7); case _ => (9, 0)
      }
      assert((disp(0) & 0xFF) == (rgba(4 * (sy * 10 + sx)) & 0xFF),
        s"o=$o displayed (0,0)")
    }
    // degrade: mutated EXIF payloads never throw
    val tagged = Webp.withExif(plain, 10, 8, 6)
    val rng = new scala.util.Random(7)
    for (_ <- 0 until 2000) {
      val m = tagged.clone()
      for (_ <- 0 to rng.nextInt(6))
        m(rng.nextInt(m.length)) = rng.nextInt(256).toByte
      val o = Webp.exifOrientation(m)
      assert(o >= 0 && o <= 8)
    }
    for (i <- 0 until tagged.length)
      assert(Webp.exifOrientation(tagged.take(i)) >= 0)
  }

  test("truncation and bad signature fail by name") {
    val img = grayArgb(12, 12, planted)
    val ok = Webp.encodeLossless(12, 12, img, LosslessOptions())
    val e1 = intercept[IllegalArgumentException](
      Webp.decodeWebpRgba(9L, ok.take(30)))
    assert(e1.getMessage.startsWith("media 9:"))
    val bad = ok.clone()
    bad(20) = 0x55 // VP8L signature byte
    val e2 = intercept[IllegalArgumentException](Webp.decodeWebpRgba(9L, bad))
    assert(e2.getMessage.contains("VP8L signature"))
  }

  test("hostile dimensions hit the decode bound by name") {
    // patch the 14-bit dims of a valid stream to the 16384 x 16384 max
    val img = grayArgb(8, 8, planted)
    val ok = Webp.encodeLossless(8, 8, img, LosslessOptions())
    val p = ok.clone()
    // bitstream starts at byte 21: 14 bits (w-1), 14 bits (h-1)
    p(21) = 0xFF.toByte; p(22) = 0xFF.toByte; p(23) = 0xFF.toByte
    p(24) = (p(24) | 0x0F).toByte
    val e = intercept[IllegalArgumentException](Webp.decodeWebpRgba(11L, p))
    assert(e.getMessage.contains("decode bound"))
  }
}
