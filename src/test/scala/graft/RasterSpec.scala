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
    // RLE compression (field at offset 30)
    val rle = bmp.clone(); rle(30) = 1
    val e1 = intercept[IllegalArgumentException](
      Raster.decodeBmpRgba(1L, rle))
    assert(e1.getMessage.contains("BI_RGB BMP"), e1.getMessage)
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
    // LZW compression (tag 259 -> 5)
    val e4 = intercept[IllegalArgumentException](
      Raster.decodeTiffRgba(1L, patchTag(tif, 259, 5)))
    assert(e4.getMessage.contains("uncompressed TIFF"), e4.getMessage)
    // 16-bit samples (tag 258 inline cell -> 16)
    val gray16 = Raster.tiff(w, h, 1, 1, rgb)
    val e5 = intercept[IllegalArgumentException](
      Raster.decodeTiffRgba(1L, patchTag(gray16, 258, 16)))
    assert(e5.getMessage.contains("only 8-bit TIFF"), e5.getMessage)
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
    val lzw = {
      val t = Raster.tiff(8, 8, 2, 3, rgb)
      val out = t.clone()
      // tag 259 value cell -> compression 5 (LZW): entry walk as above
      val n = (out(8) & 0xFF) | ((out(9) & 0xFF) << 8)
      val at = (0 until n).map(k => 10 + 12 * k).find(e =>
        ((out(e) & 0xFF) | ((out(e + 1) & 0xFF) << 8)) == 259).get
      out(at + 8) = 5
      out
    }
    val rows = Seq(
      MediaRow(0L, "image", Raster.bmp24(8, 8, rgb), 8, 8, 1),
      MediaRow(1L, "image", Raster.tiff(8, 8, 2, 3, rgb), 8, 8, 1),
      MediaRow(2L, "image", lzw, 8, 8, 1))
    val got = Multimodal.mediaDecodeHealth(rows.toDS())
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSet
    assert(got === Set(
      ("bmp", "decoded", "none", 1L),
      ("tiff", "decoded", "none", 1L),
      ("tiff", "skipped", "unsupported_coding", 1L)), got.toString)
  }
}
