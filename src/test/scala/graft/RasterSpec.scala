package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{MediaDedup, Multimodal, Raster}
import graft.multimodal.Multimodal.{Containers, MediaRow}

/** BMP + uncompressed-TIFF decode: round-trips against the in-repo
  * encoders, EXACT ImageIO agreement (both formats are lossless — zero
  * tolerance), cross-format identity with PNG through the shared
  * decodeStillRgba seam, and the named-failure surface for every
  * out-of-scope layout. */
class RasterSpec extends SparkSpec {

  private def g(id: Long)(x: Int, y: Int): Int =
    ((x.toLong * x * (7 + id % 29) + y.toLong * y * (11 + id % 17) +
      x.toLong * y * (5 + id % 11) + id * 23) % 251).toInt

  private val grayPal = Array.tabulate(256 * 3)(b => (b / 3).toByte)

  // displayed-gray check through the format-blind RGBA dispatch
  private def assertGray(id: Long, p: Array[Byte], w: Int, h: Int,
                         tag: String): Unit = {
    val (dw, dh, px) = Multimodal.decodeStillRgba(id, p)
    assert((dw, dh) === ((w, h)), tag)
    for (y <- 0 until h; x <- 0 until w) {
      val o = 4 * (y * w + x)
      val e = g(id)(x, y)
      assert((px(o) & 0xFF) === e, s"$tag R ($x,$y)")
      assert((px(o + 1) & 0xFF) === e, s"$tag G ($x,$y)")
      assert((px(o + 2) & 0xFF) === e, s"$tag B ($x,$y)")
      assert((px(o + 3) & 0xFF) === 255, s"$tag A ($x,$y)")
    }
  }

  test("BMP layout matrix round-trips: bottom-up, top-down, palette, " +
    "and the 32-bit reserved byte is dropped") {
    val id = 13L; val w = 9; val h = 6 // w=9: 27 -> 28-byte padded rows
    def rgb(k: Int): Int = g(id)((k / 3) % w, (k / 3) / w)
    assertGray(id, Raster.bmp24(w, h, rgb), w, h, "bmp24 bottom-up")
    assertGray(id, Raster.bmp24(w, h, rgb, topDown = true), w, h,
      "bmp24 top-down")
    assertGray(id, Raster.bmp8(w, h, k => g(id)(k % w, k / w), grayPal),
      w, h, "bmp8 palette")
    // the 32-bit fourth byte is RESERVED: planted junk must not surface
    assertGray(id, Raster.bmp32(w, h, rgb, reserved = 0xA7), w, h, "bmp32")
  }

  test("TIFF layout matrix round-trips: II/MM, strips, gray, RGB, " +
    "palette high-byte, WhiteIsZero inversion, unassociated alpha") {
    val id = 29L; val w = 11; val h = 7
    def gray(k: Int): Int = g(id)(k % w, k / w)
    def rgb(k: Int): Int = g(id)((k / 3) % w, (k / 3) / w)
    assertGray(id, Raster.tiff(w, h, 1, 1, gray), w, h, "II gray")
    assertGray(id, Raster.tiff(w, h, 1, 1, gray, rowsPerStrip = 3), w, h,
      "II gray multi-strip (ragged last)")
    assertGray(id, Raster.tiff(w, h, 2, 3, rgb, bigEndian = true), w, h,
      "MM rgb")
    assertGray(id, Raster.tiff(w, h, 3, 1, gray, palette = grayPal), w, h,
      "II palette via 16-bit ColorMap high byte")
    // WhiteIsZero: the encoder stores the INVERTED value; a decoder that
    // skips the inversion reads 255-g and fails here
    assertGray(id, Raster.tiff(w, h, 0, 1, k => 255 - gray(k),
      bigEndian = true, rowsPerStrip = 5), w, h, "MM WhiteIsZero")
    // spp 4: the fourth sample is alpha (ExtraSamples=2), carried through
    val alpha = Raster.tiff(w, h, 2, 4,
      k => if (k % 4 == 3) (k / 4 * 7) % 256 else g(id)((k / 4) % w, (k / 4) / w))
    val (aw, ah, apx) = Multimodal.decodeStillRgba(id, alpha)
    assert((aw, ah) === ((w, h)))
    for (y <- 0 until h; x <- 0 until w) {
      val o = 4 * (y * w + x); val k = y * w + x
      assert((apx(o) & 0xFF) === g(id)(x, y), s"alpha-tiff R ($x,$y)")
      assert((apx(o + 3) & 0xFF) === (k * 7) % 256, s"alpha-tiff A ($x,$y)")
    }
  }

  test("BMP decode agrees EXACTLY with the JDK's own ImageIO reader") {
    val id = 31L; val w = 10; val h = 5
    def rgb(k: Int): Int = g(id)((k / 3) % w, (k / 3) / w)
    for ((payload, tag) <- Seq(
      (Raster.bmp24(w, h, rgb), "bmp24"),
      (Raster.bmp24(w, h, rgb, topDown = true), "bmp24 top-down"),
      (Raster.bmp32(w, h, rgb, reserved = 0), "bmp32"))) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      assert(img != null, s"ImageIO could not open our $tag")
      val (dw, dh, px) = Multimodal.decodeStillRgba(id, payload)
      assert((dw, dh) === ((img.getWidth, img.getHeight)), tag)
      for (y <- 0 until h; x <- 0 until w) {
        val argb = img.getRGB(x, y); val o = 4 * (y * w + x)
        assert((px(o) & 0xFF) === ((argb >> 16) & 0xFF), s"$tag R ($x,$y)")
        assert((px(o + 1) & 0xFF) === ((argb >> 8) & 0xFF), s"$tag G ($x,$y)")
        assert((px(o + 2) & 0xFF) === (argb & 0xFF), s"$tag B ($x,$y)")
      }
    }
    // ImageIO reads the gray-ramp PALETTE BMP as TYPE_BYTE_GRAY, and
    // getRGB applies gamma to gray rasters — compare RASTER samples
    val pal = Raster.bmp8(w, h, k => g(id)(k % w, k / w), grayPal)
    val pimg = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(pal))
    assert(pimg != null, "ImageIO could not open our bmp8")
    val (_, _, ppx) = Multimodal.decodeStillRgba(id, pal)
    for (y <- 0 until h; x <- 0 until w)
      assert((ppx(4 * (y * w + x)) & 0xFF) ===
        pimg.getRaster.getSample(x, y, 0), s"bmp8 ($x,$y)")
  }

  test("TIFF decode agrees EXACTLY with the JDK's own ImageIO reader " +
    "(raster samples for gray — getRGB applies gamma to gray rasters)") {
    val id = 37L; val w = 8; val h = 9
    def gray(k: Int): Int = g(id)(k % w, k / w)
    def rgb(k: Int): Int = g(id)((k / 3) % w, (k / 3) / w)
    // RGB + palette compare via getRGB (sRGB direct color / index model)
    for ((payload, tag) <- Seq(
      (Raster.tiff(w, h, 2, 3, rgb), "II rgb"),
      (Raster.tiff(w, h, 2, 3, rgb, bigEndian = true, rowsPerStrip = 4),
        "MM rgb strips"),
      (Raster.tiff(w, h, 3, 1, gray, palette = grayPal), "II palette"))) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      assert(img != null, s"ImageIO could not open our $tag TIFF")
      val (dw, dh, px) = Multimodal.decodeStillRgba(id, payload)
      assert((dw, dh) === ((img.getWidth, img.getHeight)), tag)
      for (y <- 0 until h; x <- 0 until w) {
        val argb = img.getRGB(x, y); val o = 4 * (y * w + x)
        assert((px(o) & 0xFF) === ((argb >> 16) & 0xFF), s"$tag R ($x,$y)")
        assert((px(o + 1) & 0xFF) === ((argb >> 8) & 0xFF), s"$tag G ($x,$y)")
        assert((px(o + 2) & 0xFF) === (argb & 0xFF), s"$tag B ($x,$y)")
      }
    }
    // gray: compare RASTER samples, not getRGB (gamma) — and the JDK
    // TIFF reader NORMALIZES WhiteIsZero at read time (raster samples
    // come back already inverted, i.e. displayed), so both variants
    // compare against the same displayed value
    for ((payload, tag) <- Seq(
      (Raster.tiff(w, h, 1, 1, gray, rowsPerStrip = 2), "II gray"),
      (Raster.tiff(w, h, 0, 1, k => 255 - gray(k), bigEndian = true),
        "MM WhiteIsZero"))) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      assert(img != null, s"ImageIO could not open our $tag TIFF")
      val (_, _, px) = Multimodal.decodeStillRgba(id, payload)
      for (y <- 0 until h; x <- 0 until w)
        assert((px(4 * (y * w + x)) & 0xFF) ===
          img.getRaster.getSample(x, y, 0), s"$tag ($x,$y)")
    }
  }

  test("compressed TIFF matrix round-trips: LZW/Deflate/PackBits x " +
    "predictor x photometric x byte order x strips") {
    val id = 43L; val w = 19; val h = 17 // odd dims: ragged strips
    def gray(k: Int): Int = g(id)(k % w, k / w)
    def rgb(k: Int): Int = g(id)((k / 3) % w, (k / 3) / w)
    for (comp <- Seq(5, 8, 32773);
         pred <- if (comp == 32773) Seq(1) else Seq(1, 2)) {
      assertGray(id, Raster.tiff(w, h, 1, 1, gray, compression = comp,
        predictor = pred), w, h, s"gray comp=$comp pred=$pred")
      assertGray(id, Raster.tiff(w, h, 2, 3, rgb, bigEndian = true,
        rowsPerStrip = 4, compression = comp, predictor = pred), w, h,
        s"MM rgb strips comp=$comp pred=$pred")
    }
    assertGray(id, Raster.tiff(w, h, 3, 1, gray, palette = grayPal,
      compression = 5), w, h, "LZW palette")
    // compression 32946 is the old Deflate code point — same codec;
    // craft it by patching the tag value in an LZW... no: in a Deflate
    // payload (the tag cell is at a fixed, computable IFD slot)
    val dfl = Raster.tiff(w, h, 1, 1, gray, compression = 8)
    val idx = {
      // find the SHORT compression entry (tag 259) in the IFD and
      // rewrite its inline value 8 -> 32946
      val n = (dfl(8) & 0xFF) | ((dfl(9) & 0xFF) << 8)
      (0 until n).map(k => 10 + 12 * k)
        .find(at => ((dfl(at) & 0xFF) | ((dfl(at + 1) & 0xFF) << 8)) == 259)
        .get
    }
    dfl(idx + 8) = (32946 & 0xFF).toByte
    dfl(idx + 9) = ((32946 >> 8) & 0xFF).toByte
    assertGray(id, dfl, w, h, "Deflate under the 32946 code point")
  }

  test("compressed-TIFF LZW survives a table-pressure payload (code-size " +
    "growth through 10 bits exercised both ways)") {
    // noise resists LZW: the dictionary grows fast, crossing the 9->10
    // bit early-change boundary that a GIF-convention decoder misreads
    val id = 47L; val w = 64; val h = 48
    def noise(k: Int): Int =
      ((k.toLong * k * 31 + k * 17 + 7) % 256).toInt
    val p = Raster.tiff(w, h, 1, 1, noise, compression = 5)
    val (dw, dh, px) = Multimodal.decodeStillRgba(id, p)
    assert((dw, dh) === ((w, h)))
    for (k <- 0 until w * h)
      assert((px(4 * k) & 0xFF) === noise(k), s"pixel $k")
  }

  private def imageIoWriteTiff(img: java.awt.image.BufferedImage,
                               compressionType: String): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionType(compressionType)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close(); writer.dispose()
    bos.toByteArray
  }

  test("compressed TIFF agrees with the JDK's ImageIO plugin BOTH ways: " +
    "its LZW/Deflate/PackBits output decodes exactly, and ours reads back") {
    val id = 53L; val w = 21; val h = 13
    // theirs -> ours: the JDK TIFFImageWriter's own strips through our
    // decompressors (this is what pins the EARLY code-size change — a
    // GIF-convention LZW desyncs on real third-party streams)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val v = g(id)(x, y)
      img.setRGB(x, y, (v << 16) | (((v * 3 + 7) % 251) << 8) |
        ((v * 7 + 11) % 251))
    }
    for (ct <- Seq("LZW", "Deflate", "ZLib", "PackBits")) {
      val payload = imageIoWriteTiff(img, ct)
      val (dw, dh, px) = Multimodal.decodeStillRgba(id, payload)
      assert((dw, dh) === ((w, h)), ct)
      for (y <- 0 until h; x <- 0 until w) {
        val argb = img.getRGB(x, y); val o = 4 * (y * w + x)
        assert((px(o) & 0xFF) === ((argb >> 16) & 0xFF), s"$ct R ($x,$y)")
        assert((px(o + 1) & 0xFF) === ((argb >> 8) & 0xFF), s"$ct G ($x,$y)")
        assert((px(o + 2) & 0xFF) === (argb & 0xFF), s"$ct B ($x,$y)")
      }
    }
    // ours -> theirs: our encoder's streams (incl. the predictor, which
    // the JDK reader reverses) read back exactly
    def rgb(k: Int): Int = g(id)((k / 3) % w, (k / 3) / w)
    for (comp <- Seq(5, 8, 32773);
         pred <- if (comp == 32773) Seq(1) else Seq(1, 2)) {
      val payload = Raster.tiff(w, h, 2, 3, rgb, rowsPerStrip = 4,
        compression = comp, predictor = pred)
      val rimg = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      assert(rimg != null, s"ImageIO could not open comp=$comp pred=$pred")
      for (y <- 0 until h; x <- 0 until w) {
        val e = g(id)(x, y)
        val argb = rimg.getRGB(x, y)
        assert(((argb >> 16) & 0xFF) === e, s"comp=$comp pred=$pred ($x,$y)")
      }
    }
  }

  test("BI_RLE8 BMP round-trips both content shapes and agrees with " +
    "ImageIO; the delta escape skips deterministically to index 0") {
    val id = 61L; val w = 19; val h = 11
    // run-friendly (encoded runs) and noisy (absolute mode) content
    for ((f, tag) <- Seq(
      ((x: Int, y: Int) => g(id)(x / 3, y), "runs"),
      ((x: Int, y: Int) => g(id)(x, y), "noise"))) {
      val p = Raster.bmp8Rle(w, h, k => f(k % w, k / w), grayPal)
      val (dw, dh, px) = Multimodal.decodeStillRgba(id, p)
      assert((dw, dh) === ((w, h)), tag)
      for (y <- 0 until h; x <- 0 until w)
        assert((px(4 * (y * w + x)) & 0xFF) === f(x, y), s"$tag ($x,$y)")
      // cross-pin: the JDK BMP reader decodes BI_RLE8 (gray raster)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(p))
      assert(img != null, s"ImageIO could not open our RLE8 $tag BMP")
      for (y <- 0 until h; x <- 0 until w)
        assert(img.getRaster.getSample(x, y, 0) === f(x, y),
          s"imageio $tag ($x,$y)")
    }
    // hand-built delta escape: run of 2, delta (3, 1), run of 2, EOL x h
    val body = Array[Byte](2, 40, 0, 2, 3, 1, 2, 90, 0, 0, 0, 1)
    val full = Raster.bmp8Rle(4, 3, _ => 0, grayPal)
    // splice: reuse header/palette from a tiny encode, replace stream
    val offBits = (full(10) & 0xFF) | ((full(11) & 0xFF) << 8)
    val spliced = java.util.Arrays.copyOfRange(full, 0, offBits) ++ body
    // fix dims to 8x4 so the delta lands inside
    spliced(18) = 8; spliced(22) = 4
    val (_, _, dpx) = Raster.decodeBmpRgba(62L, spliced)
    // bottom row (y=3 top-down = RLE row 0): 40 40 . . . 90 90 at x=5,6
    def at(x: Int, y: Int) = dpx(4 * (y * 8 + x)) & 0xFF
    assert(at(0, 3) === 40 && at(1, 3) === 40) // identity-ramp palette
    assert(at(2, 3) === 0 && at(4, 3) === 0) // skipped by delta
    assert(at(5, 2) === 90 && at(6, 2) === 90) // one row up
  }

  test("BI_RLE4 BMP round-trips both modes and agrees with ImageIO") {
    val id = 73L; val w = 19; val h = 12
    val pal16 = Array.tabulate(16 * 3)(b => ((b / 3) * 17).toByte)
    def g4(x: Int, y: Int): Int = g(id)(x, y) % 16
    val p = Raster.bmp4Rle(w, h, k => g4(k % w, k / w), pal16)
    val (dw, dh, px) = Multimodal.decodeStillRgba(id, p)
    assert((dw, dh) === ((w, h)))
    for (y <- 0 until h; x <- 0 until w)
      assert((px(4 * (y * w + x)) & 0xFF) === g4(x, y) * 17, s"($x,$y)")
    // cross-pin: the JDK BMP reader decodes BI_RLE4 (palette indices)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
    assert(img != null, "ImageIO could not open our RLE4 BMP")
    for (y <- 0 until h; x <- 0 until w) {
      val argb = img.getRGB(x, y)
      assert(((argb >> 16) & 0xFF) === g4(x, y) * 17, s"imageio ($x,$y)")
    }
    // an RLE4 claim on an 8-bit BMP is malformed, named
    val bad = Raster.bmp8Rle(8, 4, _ => 3,
      Array.tabulate(256 * 3)(b => (b / 3).toByte))
    bad(30) = 2
    val e = intercept[IllegalArgumentException](
      Raster.decodeBmpRgba(id, bad))
    assert(e.getMessage.contains("BI_RLE4 requires"), e.getMessage)
  }

  test("16-bit TIFF reduces to the planted HIGH byte in both byte " +
    "orders; tiled layouts clip edge padding (ImageIO agreement)") {
    val id = 67L; val w = 19; val h = 17
    def gray(k: Int): Int = g(id)(k % w, k / w)
    def rgb(k: Int): Int = g(id)((k / 3) % w, (k / 3) / w)
    def noise(k: Int): Int = ((id + k) * 31 + 5).toInt % 256
    def deep16(value: Int => Int, le: Boolean): Int => Int = { k =>
      val hiAt = if (le) 1 else 0
      if (k % 2 == hiAt) value(k / 2) else noise(k)
    }
    assertGray(id, Raster.tiff(w, h, 1, 1, deep16(gray, le = true),
      bitDepth = 16, rowsPerStrip = 5), w, h, "II 16-bit gray strips")
    assertGray(id, Raster.tiff(w, h, 2, 3, deep16(rgb, le = false),
      bigEndian = true, bitDepth = 16), w, h, "MM 16-bit rgb")
    // tiled: 16x16 tiles over a 19x17 canvas -> 2x2 tiles, edge padding
    assertGray(id, Raster.tiff(w, h, 1, 1, gray, tile = 16), w, h,
      "tiled gray")
    assertGray(id, Raster.tiff(w, h, 2, 3, rgb, tile = 16,
      compression = 5, predictor = 2), w, h, "tiled LZW+pred rgb")
    assertGray(id, Raster.tiff(w, h, 1, 1, deep16(gray, le = false),
      bigEndian = true, bitDepth = 16, tile = 16, compression = 8), w, h,
      "tiled MM 16-bit Deflate gray")
    // ImageIO agreement: 16-bit raster samples are the full 16-bit
    // values — our planted high byte must equal sample >> 8
    val deepPayload = Raster.tiff(w, h, 1, 1, deep16(gray, le = true),
      bitDepth = 16)
    val dimg = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(deepPayload))
    assert(dimg != null, "ImageIO could not open our 16-bit TIFF")
    for (y <- 0 until h; x <- 0 until w)
      assert((dimg.getRaster.getSample(x, y, 0) >> 8) === g(id)(x, y),
        s"deep imageio ($x,$y)")
    // and our TILED stream reads back in ImageIO
    val timg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      Raster.tiff(w, h, 2, 3, rgb, tile = 16, compression = 5,
        predictor = 2)))
    assert(timg != null, "ImageIO could not open our tiled TIFF")
    for (y <- 0 until h; x <- 0 until w)
      assert(((timg.getRGB(x, y) >> 16) & 0xFF) === g(id)(x, y),
        s"tiled imageio ($x,$y)")
    // theirs -> ours: ImageIO WRITES a tiled LZW TIFF we must decode
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val v = g(id)(x, y)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionType("LZW")
    param.setTilingMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setTiling(16, 16, 0, 0)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close(); writer.dispose()
    assertGray(id, bos.toByteArray, w, h, "ImageIO tiled LZW")
  }

  test("hostile compressed-TIFF strips fail by name, never scribble") {
    val id = 59L; val w = 8; val h = 8
    def gray(k: Int): Int = g(id)(k % w, k / w)
    // truncated LZW strip
    val lzw = Raster.tiff(w, h, 1, 1, gray, compression = 5)
    val cut = java.util.Arrays.copyOfRange(lzw, 0, lzw.length - 6)
    // the strip byte-count still points past the cut: truncated by name
    val e1 = intercept[IllegalArgumentException](
      Multimodal.decodeStillRgba(id, cut))
    assert(e1.getMessage.contains("TIFF"), e1.getMessage)
    // PackBits run that overflows the declared strip size
    val pb = Raster.tiff(w, h, 1, 1, gray, compression = 32773)
    // find the strip and plant a 128-byte repeat run at its start
    val stripOff = pb.length - Raster.packBits(
      Array.tabulate(w * h)(gray(_).toByte)).length
    pb(stripOff) = (-127).toByte // repeat next byte 128 times
    val e2 = intercept[IllegalArgumentException](
      Multimodal.decodeStillRgba(id, pb))
    assert(e2.getMessage.contains("PackBits") ||
      e2.getMessage.contains("TIFF"), e2.getMessage)
    // corrupt Deflate stream
    val dfl = Raster.tiff(w, h, 1, 1, gray, compression = 8)
    dfl(dfl.length - 10) = (dfl(dfl.length - 10) ^ 0x55).toByte
    val e3 = intercept[IllegalArgumentException](
      Multimodal.decodeStillRgba(id, dfl))
    assert(e3.getMessage.contains("TIFF Deflate"), e3.getMessage)
  }

  test("OVERLONG compressed-TIFF segments fail by name: data past the " +
    "geometric strip size is corruption, not truncatable") {
    val id = 61L
    // 20 distinct bytes -> one literal LZW code each; decoding with
    // expect=10 lands exactly on the boundary with data codes remaining
    val raw = Array.tabulate(20)(_.toByte)
    val lzw = Raster.lzwEncode(raw)
    val e1 = intercept[IllegalArgumentException](
      Raster.lzwDecode(id, lzw, 0, lzw.length, 10))
    assert(e1.getMessage.contains("overlong TIFF LZW"), e1.getMessage)
    // the exact-size stream still decodes (EOI is read and accepted)
    assert(Raster.lzwDecode(id, lzw, 0, lzw.length, 20).toSeq === raw.toSeq)
    // same contract for Deflate
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val buf = new Array[Byte](128)
    val n = defl.deflate(buf)
    defl.end()
    val e2 = intercept[IllegalArgumentException](
      Raster.inflateExact(id, buf, 0, n, 10))
    assert(e2.getMessage.contains("overlong TIFF Deflate"), e2.getMessage)
    assert(Raster.inflateExact(id, buf, 0, n, 20).toSeq === raw.toSeq)
  }

  test("BI_RLE4 failure diagnostics carry the RLE4 name, not RLE8") {
    val pal16 = Array.tabulate(16 * 3)(b => ((b / 3) * 17).toByte)
    val p = Raster.bmp4Rle(9, 5, k => k % 16, pal16)
    val cut = java.util.Arrays.copyOfRange(p, 0, p.length - 3)
    val e = intercept[IllegalArgumentException](
      Raster.decodeBmpRgba(75L, cut))
    assert(e.getMessage.contains("RLE4") && !e.getMessage.contains("RLE8"),
      e.getMessage)
  }

  test("cross-format identity: PNG, BMP and TIFF of the same content " +
    "decode byte-identically and share one dHash (Hamming 0)") {
    val id = 41L; val w = 16; val h = 16
    def v(x: Int, y: Int): Int = g(id)(x, y)
    val png = Containers.pngFull(w, h, i =>
      if (i % 4 == 3) 255 else v((i / 4) % w, (i / 4) / w))
    val bmp = Raster.bmp24(w, h, k => v((k / 3) % w, (k / 3) / w))
    val tif = Raster.tiff(w, h, 1, 1, k => v(k % w, k / w))
    val (pw, ph, ppx) = Multimodal.decodeStillRgba(id, png)
    val (_, _, bpx) = Multimodal.decodeStillRgba(id, bmp)
    val (_, _, tpx) = Multimodal.decodeStillRgba(id, tif)
    assert((pw, ph) === ((w, h)))
    assert(ppx.toSeq === bpx.toSeq, "PNG vs BMP RGBA")
    assert(ppx.toSeq === tpx.toSeq, "PNG vs TIFF RGBA")
    val hp = MediaDedup.dhashOneImage(1L, png)
    assert(MediaDedup.dhashOneImage(2L, bmp) === hp)
    assert(MediaDedup.dhashOneImage(3L, tif) === hp)
  }

  test("out-of-scope layouts fail fast by NAME (the q265 census buckets)") {
    val w = 8; val h = 8
    def rgb(k: Int): Int = (k * 7) % 251
    val bmp = Raster.bmp24(w, h, rgb)
    // bitfields compression (field at offset 30) stays out of scope
    val rle = bmp.clone(); rle(30) = 3
    val e1 = intercept[IllegalArgumentException](
      Raster.decodeBmpRgba(1L, rle))
    assert(e1.getMessage.contains("BI_RLE4 BMP"), e1.getMessage)
    // an RLE8 claim on a 24-bit BMP is malformed, named
    val rle24 = bmp.clone(); rle24(30) = 1
    val e1b = intercept[IllegalArgumentException](
      Raster.decodeBmpRgba(1L, rle24))
    assert(e1b.getMessage.contains("BI_RLE8 requires"), e1b.getMessage)
    // 4-bit BMP (bit count at offset 28)
    val b4 = bmp.clone(); b4(28) = 4
    val e2 = intercept[IllegalArgumentException](
      Raster.decodeBmpRgba(1L, b4))
    assert(e2.getMessage.contains("bit counts"), e2.getMessage)
    // 12-byte BITMAPCOREHEADER (different field layout — must not parse)
    val core = bmp.clone(); core(14) = 12
    val e3 = intercept[IllegalArgumentException](
      Raster.decodeBmpRgba(1L, core))
    assert(e3.getMessage.contains("BITMAPINFOHEADER"), e3.getMessage)
    val tif = Raster.tiff(w, h, 2, 3, rgb)
    def patchTag(p: Array[Byte], tag: Int, value: Int): Array[Byte] = {
      val out = p.clone()
      val n = (out(8) & 0xFF) | ((out(9) & 0xFF) << 8)
      val at = (0 until n).map(k => 10 + 12 * k).find(e =>
        ((out(e) & 0xFF) | ((out(e + 1) & 0xFF) << 8)) == tag).get
      out(at + 8) = value.toByte; out(at + 9) = (value >> 8).toByte
      out
    }
    // JPEG-in-TIFF compression (tag 259 -> 7) stays out of scope
    val e4 = intercept[IllegalArgumentException](
      Raster.decodeTiffRgba(1L, patchTag(tif, 259, 7)))
    assert(e4.getMessage.contains("TIFF compression"), e4.getMessage)
    // the predictor tag is codec-attached: 2 under PackBits is a shape
    // every real decoder ignores — named, never silently honored
    val e4b = intercept[IllegalArgumentException](
      Raster.decodeTiffRgba(1L,
        patchTag(Raster.tiff(w, h, 2, 3, rgb, compression = 5,
          predictor = 2), 259, 32773))) // LZW+predictor -> PackBits tag
    assert(e4b.getMessage.contains("TIFF predictor"), e4b.getMessage)
    // 12-bit samples (tag 258 inline cell -> 12) stay out of scope
    val gray16 = Raster.tiff(w, h, 1, 1, rgb)
    val e5 = intercept[IllegalArgumentException](
      Raster.decodeTiffRgba(1L, patchTag(gray16, 258, 12)))
    assert(e5.getMessage.contains("only 8- or 16-bit TIFF"), e5.getMessage)
    // photometric/spp disagreement (a gray file claiming 3 samples)
    val e6 = intercept[IllegalArgumentException](
      Raster.decodeTiffRgba(1L, patchTag(gray16, 277, 3)))
    assert(e6.getMessage.contains("incompatible"), e6.getMessage)
    // truncated strip data
    val e7 = intercept[IllegalArgumentException](
      Raster.decodeTiffRgba(1L, tif.dropRight(10)))
    assert(e7.getMessage.toLowerCase.contains("truncated"), e7.getMessage)
  }

  test("binaryMediaMeta detects bmp/tiff and reads dims as expressions " +
    "(signed BMP height; IFD walk in both byte orders)") {
    val spark2 = spark
    import spark2.implicits._
    def rgb(k: Int): Int = (k * 3) % 251
    val rows = Seq(
      MediaRow(0L, "image", Raster.bmp24(9, 6, rgb), 9, 6, 1),
      MediaRow(1L, "image", Raster.bmp24(7, 5, rgb, topDown = true), 7, 5, 1),
      MediaRow(2L, "image", Raster.tiff(11, 4, 2, 3, rgb), 11, 4, 1),
      MediaRow(3L, "image",
        Raster.tiff(6, 8, 1, 1, rgb, bigEndian = true), 6, 8, 1))
    val got = Multimodal.binaryMediaMeta(rows.toDS().toDF())
      .select("media_id", "format", "img_width", "img_height", "n_frames")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getInt(3), r.getLong(4))).toSet
    assert(got === Set(
      (0L, "bmp", 9, 6, 1L), (1L, "bmp", 7, 5, 1L),
      (2L, "tiff", 11, 4, 1L), (3L, "tiff", 6, 8, 1L)), got.toString)
  }

  test("raster fixtures land in the health census as decoded; hostile " +
    "variants by name") {
    val spark2 = spark
    import spark2.implicits._
    def rgb(k: Int): Int = (k * 11) % 251
    def patch259(t: Array[Byte], v: Int): Array[Byte] = {
      val out = t.clone()
      val n = (out(8) & 0xFF) | ((out(9) & 0xFF) << 8)
      val at = (0 until n).map(k => 10 + 12 * k).find(e =>
        ((out(e) & 0xFF) | ((out(e + 1) & 0xFF) << 8)) == 259).get
      out(at + 8) = v.toByte; out(at + 9) = (v >> 8).toByte
      out
    }
    val rows = Seq(
      MediaRow(0L, "image", Raster.bmp24(8, 8, rgb), 8, 8, 1),
      MediaRow(1L, "image", Raster.tiff(8, 8, 2, 3, rgb), 8, 8, 1),
      // JPEG-in-TIFF: a named scope restriction
      MediaRow(2L, "image", patch259(Raster.tiff(8, 8, 2, 3, rgb), 7),
        8, 8, 1),
      // an LZW tag on raw (non-LZW) strip bytes: a corrupt stream, not
      // a scope restriction — the census separates the two
      MediaRow(3L, "image", patch259(Raster.tiff(8, 8, 2, 3, rgb), 5),
        8, 8, 1),
      // real LZW decodes
      MediaRow(4L, "image", Raster.tiff(8, 8, 2, 3, rgb, compression = 5,
        predictor = 2), 8, 8, 1))
    val got = Multimodal.mediaDecodeHealth(rows.toDS())
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSet
    assert(got === Set(
      ("bmp", "decoded", "none", 1L),
      ("tiff", "decoded", "none", 2L),
      ("tiff", "skipped", "unsupported_coding", 1L),
      ("tiff", "skipped", "corrupt_stream", 1L)), got.toString)
  }
}
