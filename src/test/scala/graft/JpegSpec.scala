package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Jpeg

/** The baseline-JPEG codec contract (the q217/q222 pattern applied to the
  * web's dominant image format):
  *  - DC-ONLY blocks decode to the CLOSED FORM clamp(dc + 128) exactly
  *    (fixture quant q00 = 8 cancels the IDCT's /8) — grayscale AND the
  *    3-component color wrap (chroma planted at 128) — so planted
  *    fixtures replay arithmetically in an external SQL oracle;
  *  - general-coefficient decodes are pinned against the JDK's OWN
  *    ImageIO JPEG reader within a small per-pixel rounding tolerance
  *    (decoders may legally differ in IDCT rounding — T.81 only bounds
  *    accuracy); the fixtures' GENERATED canonical Huffman tables are
  *    exercised by an independent decoder, not assumed;
  *  - restart markers round-trip (predictor resets included);
  *  - out-of-scope shapes (progressive, subsampled, 12-bit, multi-scan)
  *    and hostile bytes fail by NAME — FuzzSpec drives the random-bytes
  *    side of that contract.
  */
class JpegSpec extends AnyFunSuite {

  private def decodeImageIO(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO could not open our JPEG — container invalid")
    val w = img.getWidth
    val h = img.getHeight
    val rgb = new Array[Int](3 * w * h)
    val oneBand = img.getRaster.getNumBands == 1
    for (y <- 0 until h; x <- 0 until w) {
      val o = 3 * (y * w + x)
      if (oneBand) {
        // getRGB on TYPE_BYTE_GRAY converts linear gray -> sRGB (a gamma
        // curve); the raster holds the decoder's actual luma samples
        val v = img.getRaster.getSample(x, y, 0)
        rgb(o) = v; rgb(o + 1) = v; rgb(o + 2) = v
      } else {
        val argb = img.getRGB(x, y)
        rgb(o) = (argb >>> 16) & 0xFF
        rgb(o + 1) = (argb >>> 8) & 0xFF
        rgb(o + 2) = argb & 0xFF
      }
    }
    (w, h, rgb)
  }

  private def maxAbsDiff(a: Array[Byte], b: Array[Int]): Int = {
    assert(a.length == b.length)
    var m = 0
    var i = 0
    while (i < a.length) {
      val d = math.abs((a(i) & 0xFF) - b(i))
      if (d > m) m = d
      i += 1
    }
    m
  }

  test("DC-only grayscale decodes to the exact closed-form block constants") {
    // 3x2 blocks of 8x8, per-block grays from a multiplicative formula
    val bw = 3; val bh = 2
    val grays = Array.tabulate(bw * bh)(k => (k * 37 + 11) % 256)
    val bytes = Jpeg.encodeGrayBlocks(bw * 8, bh * 8, grays)
    val (w, h, rgb) = Jpeg.decodeRgb(1L, bytes)
    assert((w, h) === ((24, 16)))
    for (y <- 0 until h; x <- 0 until w) {
      val g = grays((y / 8) * bw + x / 8)
      val o = 3 * (y * w + x)
      assert((rgb(o) & 0xFF) === g, s"R at ($x,$y)")
      assert((rgb(o + 1) & 0xFF) === g, s"G at ($x,$y)")
      assert((rgb(o + 2) & 0xFF) === g, s"B at ($x,$y)")
    }
  }

  test("the color wrap (chroma planted at 128) keeps the closed form exact") {
    val bw = 2; val bh = 2
    val grays = Array(0, 255, 128, 77)
    val bytes = Jpeg.encodeGrayBlocks(bw * 8, bh * 8, grays, color = true)
    val (w, h, rgb) = Jpeg.decodeRgb(2L, bytes)
    assert((w, h) === ((16, 16)))
    for (y <- 0 until h; x <- 0 until w) {
      val g = grays((y / 8) * bw + x / 8)
      val o = 3 * (y * w + x)
      assert((rgb(o) & 0xFF) === g, s"R at ($x,$y)")
      assert((rgb(o + 1) & 0xFF) === g, s"G at ($x,$y)")
      assert((rgb(o + 2) & 0xFF) === g, s"B at ($x,$y)")
    }
  }

  test("non-multiple-of-8 dimensions crop the block padding correctly") {
    val grays = Array(40, 200) // 2x1 blocks, declared 13x5
    val bytes = Jpeg.encodeGrayBlocks(13, 5, grays)
    val (w, h, rgb) = Jpeg.decodeRgb(3L, bytes)
    assert((w, h) === ((13, 5)))
    assert(rgb.length === 3 * 13 * 5)
    for (y <- 0 until h; x <- 0 until w) {
      val g = grays(x / 8)
      assert((rgb(3 * (y * w + x)) & 0xFF) === g, s"($x,$y)")
    }
  }

  test("restart markers round-trip (predictor resets included)") {
    val bw = 4; val bh = 2
    val grays = Array.tabulate(bw * bh)(k => (k * 53 + 19) % 256)
    val bytes = Jpeg.encodeGrayBlocks(bw * 8, bh * 8, grays, restartInterval = 3)
    val (w, h, rgb) = Jpeg.decodeRgb(4L, bytes)
    assert((w, h) === ((32, 16)))
    for (y <- 0 until h; x <- 0 until w) {
      val g = grays((y / 8) * bw + x / 8)
      assert((rgb(3 * (y * w + x)) & 0xFF) === g, s"($x,$y)")
    }
    // color + restarts through the same path
    val cBytes = Jpeg.encodeGrayBlocks(bw * 8, bh * 8, grays, color = true,
      restartInterval = 2)
    val (_, _, cRgb) = Jpeg.decodeRgb(5L, cBytes)
    assert(cRgb.toSeq === rgb.toSeq)
  }

  test("general-coefficient grayscale agrees with the JDK's OWN ImageIO " +
    "reader within IDCT rounding tolerance") {
    // AC coefficients exercise the full Huffman run/size alphabet, the
    // zigzag order, ZRL, and EOB; small magnitudes keep every pixel far
    // from the clamp so rounding is the ONLY legal difference
    val bw = 2; val bh = 2
    val blocks = Array.tabulate(bw * bh) { b =>
      val blk = new Array[Int](64)
      blk(0) = (b * 23 - 40) // DC
      var k = 0
      while (k < 64) {
        if (k > 0 && (k * 7 + b * 5) % 11 == 0)
          blk(k) = ((k * 13 + b * 29) % 9) - 4
        k += 1
      }
      blk
    }
    val bytes = Jpeg.encodeBlocks(16, 16, Array(blocks))
    val (w, h, ours) = Jpeg.decodeRgb(6L, bytes)
    val (iw, ih, theirs) = decodeImageIO(bytes)
    assert((w, h) === ((iw, ih)))
    val d = maxAbsDiff(ours, theirs)
    assert(d <= 2, s"max per-pixel diff vs ImageIO: $d")
  }

  test("general-coefficient COLOR decode agrees with ImageIO within " +
    "rounding tolerance (YCbCr transform included)") {
    val bw = 2; val bh = 1
    def comp(seed: Int) = Array.tabulate(bw * bh) { b =>
      val blk = new Array[Int](64)
      blk(0) = ((b * 31 + seed * 17) % 60) - 30
      var k = 0
      while (k < 64) {
        if (k > 0 && (k * 5 + seed * 3 + b) % 13 == 0)
          blk(k) = ((k * 7 + seed * 11 + b * 3) % 7) - 3
        k += 1
      }
      blk
    }
    val bytes = Jpeg.encodeBlocks(16, 8, Array(comp(1), comp(2), comp(3)))
    val (w, h, ours) = Jpeg.decodeRgb(7L, bytes)
    val (iw, ih, theirs) = decodeImageIO(bytes)
    assert((w, h) === ((iw, ih)))
    // two independent rounding stages (IDCT + YCbCr) may each differ ±1
    val d = maxAbsDiff(ours, theirs)
    assert(d <= 3, s"max per-pixel diff vs ImageIO: $d")
  }

  test("DC-only fixtures also open identically in ImageIO (exact)") {
    val grays = Array(13, 77, 200, 255)
    val bytes = Jpeg.encodeGrayBlocks(16, 16, grays, color = true)
    val (_, _, ours) = Jpeg.decodeRgb(8L, bytes)
    val (_, _, theirs) = decodeImageIO(bytes)
    // constant blocks: any conformant IDCT reproduces them exactly
    assert(maxAbsDiff(ours, theirs) <= 1)
  }

  test("baseline, 4:2:0, and PROGRESSIVE encodings of the SAME content " +
    "land on ONE dHash — layout-blind perceptual dedup within JPEG") {
    import graft.multimodal.MediaDedup
    // 64x64, 8x8-block-constant content: exact through all three layouts
    def g(k: Int): Int = (k * k * 11 + k * 7 + 31) % 256
    val grays = Array.tabulate(64)(g)
    val baseline = Jpeg.encodeGrayBlocks(64, 64, grays, color = true)
    val sub420 = Jpeg.encodeGray420(64, 64, grays)
    val luma = grays.map { v =>
      val blk = new Array[Int](64)
      blk(0) = v - 128
      blk
    }
    val prog = Jpeg.encodeProgressive(64, 64,
      Array(luma, Array.fill(64)(new Array[Int](64)),
        Array.fill(64)(new Array[Int](64))))
    val hashes = Seq(baseline, sub420, prog).zipWithIndex.map { case (b, i) =>
      MediaDedup.dhashOneImage(100L + i, b)
    }
    assert(hashes.distinct.length === 1,
      s"layouts disagree: ${hashes.mkString(", ")}")
  }

  test("a JPEG and a PNG of the SAME content land on the SAME dHash — " +
    "perceptual dedup is three-format-blind") {
    import graft.multimodal.{MediaDedup, Multimodal}
    val bw = 2; val bh = 2
    val grays = Array(30, 180, 90, 240)
    val jpeg = Jpeg.encodeGrayBlocks(bw * 8, bh * 8, grays, color = true)
    val png = Multimodal.Containers.pngFull(bw * 8, bh * 8, { i =>
      val k = i / 4
      if (i % 4 == 3) 255
      else grays(((k / 16) / 8) * bw + (k % 16) / 8)
    })
    val hj = MediaDedup.dhashOneImage(1L, jpeg)
    val hp = MediaDedup.dhashOneImage(2L, png)
    assert(hj === hp, "cross-format dHash mismatch")
    // and a DIFFERENT JPEG does not collide
    val other = Jpeg.encodeGrayBlocks(bw * 8, bh * 8,
      Array(240, 90, 180, 30), color = true)
    assert(MediaDedup.dhashOneImage(3L, other) !== hj)
  }

  test("out-of-scope and malformed shapes fail by NAME") {
    val ok = Jpeg.encodeGrayBlocks(16, 8, Array(50, 100))

    // progressive: patch SOF0 (FFC0) to SOF2 (FFC2)
    val prog = ok.clone()
    val sofAt = prog.indices.find(i => (prog(i) & 0xFF) == 0xFF &&
      i + 1 < prog.length && (prog(i + 1) & 0xFF) == 0xC0).get
    prog(sofAt + 1) = 0xC2.toByte
    val e1 = intercept[IllegalArgumentException](Jpeg.decodeRgb(9L, prog))
    assert(e1.getMessage.contains("progressive"))

    // sampling factor 5: beyond the 1-to-4 profile (0x11 -> 0x55;
    // factors up to 4 decode since the wide-sampling close)
    val sub = ok.clone()
    // SOF0 layout: FF C0 len(2) prec(1) h(2) w(2) ncomp(1) [id hv tq]...
    sub(sofAt + 11) = 0x55.toByte
    val e2 = intercept[IllegalArgumentException](Jpeg.decodeRgb(10L, sub))
    assert(e2.getMessage.contains("sampling"))

    // 12-bit precision
    val prec = ok.clone()
    prec(sofAt + 4) = 12.toByte
    val e3 = intercept[IllegalArgumentException](Jpeg.decodeRgb(11L, prec))
    assert(e3.getMessage.contains("precision"))

    // EOI before SOS
    val eoi = ok.take(2) ++ Array(0xFF.toByte, 0xD9.toByte)
    val e4 = intercept[IllegalArgumentException](Jpeg.decodeRgb(12L, eoi))
    assert(e4.getMessage.contains("EOI before SOS"))

    // not a JPEG at all
    val e5 = intercept[IllegalArgumentException](
      Jpeg.decodeRgb(13L, Array[Byte](1, 2, 3, 4)))
    assert(e5.getMessage.contains("not a JPEG"))

    // dimension bomb: SOF0 declaring w*h over the decode bound
    val bomb = ok.clone()
    bomb(sofAt + 5) = 0xFF.toByte; bomb(sofAt + 6) = 0xFF.toByte // h=65535
    bomb(sofAt + 7) = 0xFF.toByte; bomb(sofAt + 8) = 0xFF.toByte // w=65535
    val e6 = intercept[IllegalArgumentException](Jpeg.decodeRgb(14L, bomb))
    assert(e6.getMessage.contains("decode bound"))
  }

  test("EXIF orientation: written tags read back, the pixel decoder " +
    "ignores APP1, ImageIO still opens the file, and every orientation " +
    "transform matches the published tag-274 semantics") {
    val base = Jpeg.encodeGrayBlocks(16, 8, Array(40, 90)) // 2x1 blocks
    assert(Jpeg.exifOrientation(base) === 0) // no APP1 -> undeclared
    for (o <- 1 to 8) {
      val tagged = Jpeg.withExif(base, o)
      assert(Jpeg.exifOrientation(tagged) === o)
      // the entropy decode is unaffected by the extra segment
      val (w, h, rgb) = Jpeg.decodeRgb(30L + o, tagged)
      assert((w, h) === ((16, 8)))
      assert(rgb(0) === 40.toByte && rgb(3 * 15) === 90.toByte)
      assert(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(tagged)) != null)
    }
    // displayed pixels: stored left block 40, right block 90
    // o=2 (flip h): displayed left is 90
    val (w2, h2, o2, r2) = Jpeg.decodeRgbOriented(40L, Jpeg.withExif(base, 2))
    assert((w2, h2, o2) === ((16, 8, 2)))
    assert((r2(0) & 0xFF) === 90 && (r2(3 * 15) & 0xFF) === 40)
    // o=6 (rot90 CW): dims swap; stored bottom-left -> displayed top-left,
    // stored column x=0 (value 40) becomes the displayed TOP row
    val (w6, h6, o6, r6) = Jpeg.decodeRgbOriented(41L, Jpeg.withExif(base, 6))
    assert((w6, h6, o6) === ((8, 16, 6)))
    // displayed (0,0) = stored (0, h-1): left block, 40
    assert((r6(0) & 0xFF) === 40)
    // displayed bottom-left (0, 15) = stored (15, 7): right block, 90
    assert((r6(3 * (15 * 8)) & 0xFF) === 90)
    // a big-endian (MM) TIFF body parses too
    val mm = base.take(2) ++ (Seq(0xFF, 0xE1, 0, 34) ++
      "Exif".getBytes("US-ASCII").map(_.toInt) ++ Seq(0, 0) ++
      Seq('M'.toInt, 'M'.toInt, 0, 42, 0, 0, 0, 8, // header, IFD0 at 8
        0, 1, // one entry
        0x01, 0x12, 0, 3, 0, 0, 0, 1, 0, 5, 0, 0, // tag 274 SHORT 1 value 5
        0, 0, 0, 0)).map(_.toByte).toArray ++ base.drop(2)
    assert(Jpeg.exifOrientation(mm) === 5)
  }

  test("4:2:0 DC-only decode hits the exact closed form, block positions " +
    "included (the subsampled MCU walk places 2x2 luma correctly)") {
    // 32x16: 2x1 MCUs, luma grid 4x2 — per-block grays from a
    // multiplicative formula so a swapped placement changes pixels
    val lbw = 4; val lbh = 2
    val grays = Array.tabulate(lbw * lbh)(k => (k * 41 + 23) % 256)
    val bytes = Jpeg.encodeGray420(32, 16, grays)
    val (w, h, rgb) = Jpeg.decodeRgb(50L, bytes)
    assert((w, h) === ((32, 16)))
    for (y <- 0 until h; x <- 0 until w) {
      val g = grays((y / 8) * lbw + x / 8)
      val o = 3 * (y * w + x)
      assert((rgb(o) & 0xFF) === g, s"R at ($x,$y)")
      assert((rgb(o + 1) & 0xFF) === g, s"G at ($x,$y)")
      assert((rgb(o + 2) & 0xFF) === g, s"B at ($x,$y)")
    }
    // restart markers now span SIX data units per MCU — same closed form
    val (rw, rh, rRgb) = Jpeg.decodeRgb(51L,
      Jpeg.encodeGray420(32, 16, grays, restartInterval = 1))
    assert((rw, rh) === ((32, 16)) && rRgb.toSeq === rgb.toSeq)
  }

  test("WIDE sampling factors (3 and 4) decode to the exact closed form " +
    "and agree with ImageIO; factor 5 and >10 blocks/MCU fail by name") {
    for ((hv, w, h) <- Seq((0x41, 32, 16), (0x14, 16, 32), (0x31, 48, 16),
      (0x13, 16, 48), (0x42, 32, 16))) {
      val bw = w / 8
      val grays = Array.tabulate(bw * (h / 8))(k => (k * 37 + 19) % 256)
      for (ri <- Seq(0, 1)) {
        val bytes = Jpeg.encodeGraySampled(w, h, grays, hv,
          restartInterval = ri)
        val (dw, dh, rgb) = Jpeg.decodeRgb(70L, bytes)
        assert((dw, dh) === ((w, h)), f"hv=0x$hv%02x ri=$ri")
        for (y <- 0 until h; x <- 0 until w)
          assert((rgb(3 * (y * w + x)) & 0xFF) === grays((y / 8) * bw + x / 8),
            f"hv=0x$hv%02x ri=$ri ($x,$y)")
        // DC-only + neutral chroma: ImageIO must read the same pixels
        // exactly (constant blocks are IDCT-implementation-blind)
        val (iw, ih, theirs) = decodeImageIO(bytes)
        assert((iw, ih) === ((w, h)), f"imageio hv=0x$hv%02x")
        assert(maxAbsDiff(rgb, theirs) === 0, f"imageio hv=0x$hv%02x ri=$ri")
      }
    }
    // factor 5 stays out of scope, named
    val base = Jpeg.encodeGraySampled(32, 16, Array.fill(8)(99), 0x41)
    val sof = base.indices.find(i => (base(i) & 0xFF) == 0xFF &&
      (base(i + 1) & 0xFF) == 0xC0).get
    val f5 = base.clone(); f5(sof + 11) = 0x51.toByte
    val e1 = intercept[IllegalArgumentException](Jpeg.decodeRgb(71L, f5))
    assert(e1.getMessage.contains("sampling factors 1 to 4"), e1.getMessage)
    // 4x4 + 1 + 1 = 18 blocks/MCU violates T.81 B.2.2, named
    val f44 = base.clone(); f44(sof + 11) = 0x44.toByte
    val e2 = intercept[IllegalArgumentException](Jpeg.decodeRgb(72L, f44))
    assert(e2.getMessage.contains("10-blocks-per-MCU"), e2.getMessage)
  }

  test("4:2:0 NONZERO chroma replicates to the whole MCU (sample " +
    "replication) and the YCbCr closed form holds per pixel") {
    // 2 MCUs with DIFFERENT chroma constants: an upsample indexing bug
    // bleeds one MCU's chroma into the other
    val grays = Array.fill(8)(120) // luma grid 4x2, flat
    val cbs = Array(140, 100) // per-MCU Cb
    val crs = Array(90, 160) // per-MCU Cr
    val bytes = Jpeg.encodeGray420(32, 16, grays, cbs, crs)
    val (w, h, rgb) = Jpeg.decodeRgb(52L, bytes)
    assert((w, h) === ((32, 16)))
    def cl(v: Double): Int = {
      val r = math.floor(v + 0.5).toInt
      if (r < 0) 0 else if (r > 255) 255 else r
    }
    for (y <- 0 until h; x <- 0 until w) {
      val m = x / 16 // MCU column
      val cb = cbs(m) - 128
      val cr = crs(m) - 128
      val o = 3 * (y * w + x)
      assert((rgb(o) & 0xFF) === cl(120 + 1.402 * cr), s"R at ($x,$y)")
      assert((rgb(o + 1) & 0xFF) ===
        cl(120 - 0.344136 * cb - 0.714136 * cr), s"G at ($x,$y)")
      assert((rgb(o + 2) & 0xFF) === cl(120 + 1.772 * cb), s"B at ($x,$y)")
    }
  }

  test("4:2:0 general-coefficient luma agrees with the JDK's OWN ImageIO " +
    "reader (constant chroma, which every legal upsampler preserves)") {
    // general luma AC exercises the 2x2-per-MCU entropy walk; chroma is
    // CONSTANT across the image because interpolating upsamplers (the
    // JDK's) legally differ from sample replication on varying chroma
    val mcuW = 2; val mcuH = 1
    val luma = Array.tabulate(4 * mcuW * mcuH) { b =>
      val blk = new Array[Int](64)
      blk(0) = (b * 19 - 30) % 50
      var k = 0
      while (k < 64) {
        if (k > 0 && (k * 7 + b * 3) % 11 == 0)
          blk(k) = ((k * 13 + b * 29) % 9) - 4
        k += 1
      }
      blk
    }
    def flatChroma(dc: Int) = Array.fill(mcuW * mcuH) {
      val blk = new Array[Int](64)
      blk(0) = dc
      blk
    }
    val bytes = Jpeg.encodeBlocks(32, 16,
      Array(luma, flatChroma(12), flatChroma(-9)),
      sampling = Array(0x22, 0x11, 0x11))
    val (w, h, ours) = Jpeg.decodeRgb(53L, bytes)
    val (iw, ih, theirs) = decodeImageIO(bytes)
    assert((w, h) === ((iw, ih)))
    val d = maxAbsDiff(ours, theirs)
    assert(d <= 3, s"max per-pixel diff vs ImageIO: $d")
  }

  test("4:2:2 and 4:4:0 (one subsampled axis) decode the DC-only closed " +
    "form exactly") {
    for ((hv, lbw, lbh, w, h) <- Seq((0x21, 4, 1, 32, 8), (0x12, 1, 4, 8, 32))) {
      val grays = Array.tabulate(lbw * lbh)(k => (k * 67 + 31) % 256)
      val luma = grays.map { g =>
        val blk = new Array[Int](64)
        blk(0) = g - 128
        blk
      }
      val nChroma = (lbw * lbh) / 2 // chroma grid: one block per MCU
      val chroma = Array.fill(nChroma)(new Array[Int](64))
      val bytes = Jpeg.encodeBlocks(w, h, Array(luma, chroma.clone(), chroma),
        sampling = Array(hv, 0x11, 0x11))
      val (dw, dh, rgb) = Jpeg.decodeRgb(54L, bytes)
      assert((dw, dh) === ((w, h)))
      for (y <- 0 until h; x <- 0 until w) {
        val g = grays((y / 8) * lbw + x / 8)
        assert((rgb(3 * (y * w + x)) & 0xFF) === g, s"hv=$hv ($x,$y)")
      }
    }
  }

  test("PROGRESSIVE DC-only decode hits the same closed form as baseline " +
    "(multi-scan spectral-selection structure earned)") {
    val bw = 3; val bh = 2
    val grays = Array.tabulate(bw * bh)(k => (k * 43 + 17) % 256)
    def comps(n: Int) = {
      val luma = grays.map { g =>
        val blk = new Array[Int](64)
        blk(0) = g - 128
        blk
      }
      if (n == 3) Array(luma, Array.fill(bw * bh)(new Array[Int](64)),
        Array.fill(bw * bh)(new Array[Int](64)))
      else Array(luma)
    }
    for (n <- Seq(1, 3)) {
      val bytes = Jpeg.encodeProgressive(bw * 8, bh * 8, comps(n))
      assert(bytes.indices.exists(i => (bytes(i) & 0xFF) == 0xFF &&
        i + 1 < bytes.length && (bytes(i + 1) & 0xFF) == 0xC2),
        "fixture must carry a SOF2 marker")
      val (w, h, rgb) = Jpeg.decodeRgb(80L + n, bytes)
      assert((w, h) === ((24, 16)))
      for (y <- 0 until h; x <- 0 until w) {
        val g = grays((y / 8) * bw + x / 8)
        assert((rgb(3 * (y * w + x)) & 0xFF) === g, s"n=$n ($x,$y)")
      }
    }
  }

  test("general-coefficient PROGRESSIVE decode equals its baseline twin " +
    "EXACTLY (same coefficients, same IDCT — no tolerance)") {
    val bw = 2; val bh = 2
    def comp(seed: Int) = Array.tabulate(bw * bh) { b =>
      val blk = new Array[Int](64)
      blk(0) = ((b * 29 + seed * 13) % 50) - 25
      var k = 0
      while (k < 64) {
        if (k > 0 && (k * 7 + seed * 5 + b * 3) % 9 == 0)
          blk(k) = ((k * 11 + seed * 7 + b) % 9) - 4
        k += 1
      }
      blk
    }
    for (comps <- Seq(Array(comp(1)), Array(comp(1), comp(2), comp(3)))) {
      val base = Jpeg.encodeBlocks(16, 16, comps)
      val prog = Jpeg.encodeProgressive(16, 16, comps,
        bands = Seq((1, 3), (4, 20), (21, 63)))
      val (_, _, rgbB) = Jpeg.decodeRgb(85L, base)
      val (_, _, rgbP) = Jpeg.decodeRgb(86L, prog)
      assert(rgbP.toSeq === rgbB.toSeq, s"nComp=${comps.length}")
    }
  }

  test("PROGRESSIVE restart markers round-trip (predictor + EOB-run " +
    "resets inside DC and AC scans)") {
    val bw = 4; val bh = 2
    def comp(seed: Int) = Array.tabulate(bw * bh) { b =>
      val blk = new Array[Int](64)
      blk(0) = ((b * 21 + seed * 11) % 60) - 30
      var k = 0
      while (k < 64) {
        if (k > 0 && (k * 5 + seed * 7 + b) % 13 == 0)
          blk(k) = ((k * 3 + seed + b * 5) % 9) - 4
        k += 1
      }
      blk
    }
    for (comps <- Seq(Array(comp(1)), Array(comp(1), comp(2), comp(3)))) {
      val plain = Jpeg.encodeProgressive(32, 16, comps)
      val restarted = Jpeg.encodeProgressive(32, 16, comps,
        restartInterval = 3)
      assert(restarted.length > plain.length, "RSTn markers must be present")
      val (_, _, rgbA) = Jpeg.decodeRgb(95L, plain)
      val (_, _, rgbB) = Jpeg.decodeRgb(96L, restarted)
      assert(rgbB.toSeq === rgbA.toSeq, s"nComp=${comps.length}")
    }
  }

  test("an ImageIO-WRITTEN progressive JPEG (real successive-approximation " +
    "scan script) decodes within rounding tolerance of ImageIO's reader") {
    val w = 40; val h = 24
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, (x * 5 + y * 7 + (x * y) % 31) % 256)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close(); writer.dispose()
    val bytes = baos.toByteArray
    assert(bytes.indices.exists(i => (bytes(i) & 0xFF) == 0xFF &&
      i + 1 < bytes.length && (bytes(i + 1) & 0xFF) == 0xC2),
      "the JDK writer must emit SOF2 in progressive mode")
    val (dw, dh, ours) = Jpeg.decodeRgb(87L, bytes)
    val (iw, ih, theirs) = decodeImageIO(bytes)
    assert((dw, dh) === ((iw, ih)))
    val d = maxAbsDiff(ours, theirs)
    assert(d <= 2, s"max per-pixel diff vs ImageIO on its own progressive: $d")
  }

  test("an ImageIO-WRITTEN COLOR progressive JPEG (the JDK's subsampled " +
    "layout) decodes within tolerance — gray content keeps chroma " +
    "constant so upsampler choice cannot bias the pin") {
    val w = 48; val h = 32
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val g = (x * 3 + y * 5 + (x * y) % 23) % 256
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close(); writer.dispose()
    val bytes = baos.toByteArray
    // locate SOF2 and report the luma sampling byte so the test records
    // whether the JDK emitted the subsampled (0x22) layout
    val sof = bytes.indices.find(i => (bytes(i) & 0xFF) == 0xFF &&
      i + 1 < bytes.length && (bytes(i + 1) & 0xFF) == 0xC2)
    assert(sof.isDefined, "the JDK writer must emit SOF2 in progressive mode")
    val lumaHv = bytes(sof.get + 11) & 0xFF
    info(s"JDK progressive color luma sampling byte: 0x${lumaHv.toHexString}")
    val (dw, dh, ours) = Jpeg.decodeRgb(88L, bytes)
    val (iw, ih, theirs) = decodeImageIO(bytes)
    assert((dw, dh) === ((iw, ih)))
    val d = maxAbsDiff(ours, theirs)
    assert(d <= 3, s"max per-pixel diff vs ImageIO (luma hv=$lumaHv): $d")
  }

  test("a SOS component selector out of frame order fails by NAME " +
    "(T.81 B.2.3 mandates frame-header order)") {
    val ok = Jpeg.encodeGrayBlocks(16, 16, Array(10, 20, 30, 40), color = true)
    val sosAt = ok.indices.find(i => (ok(i) & 0xFF) == 0xFF &&
      i + 1 < ok.length && (ok(i + 1) & 0xFF) == 0xDA).get
    // SOS layout: FF DA len(2) ns(1) [Cs TdTa]... — swap Cs of the first
    // two scan components
    val bad = ok.clone()
    bad(sosAt + 5) = 2.toByte
    bad(sosAt + 7) = 1.toByte
    val e = intercept[IllegalArgumentException](Jpeg.decodeRgb(55L, bad))
    assert(e.getMessage.contains("component selector"), e.getMessage)
  }

  test("a hostile positive segment length near 2^31 fails as 'truncated', " +
    "not an index error (the Long-bound contract)") {
    // SOI + DQT whose 16-bit max length can't overflow Int, so attack the
    // entropy path instead: SOI + a segment claiming the max u16 length
    // over a short payload must name truncation
    val hostile = Array(0xFF, 0xD8, 0xFF, 0xDB, 0xFF, 0xFF, 0x00).map(_.toByte)
    val e = intercept[IllegalArgumentException](Jpeg.decodeRgb(15L, hostile))
    assert(e.getMessage.contains("truncated"), e.getMessage)
  }
}
