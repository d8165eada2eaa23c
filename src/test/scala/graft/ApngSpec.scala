package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{MediaDedup, Multimodal}
import graft.multimodal.Multimodal.Containers
import graft.multimodal.Multimodal.Containers.ApngFrameSpec

/** APNG (the PNG animation extension, W3C PNG spec third edition):
  * round-trips against the in-repo encoder, canvas-algebra semantics
  * (blend SOURCE/OVER, dispose none/background/previous, the shared
  * fcTL/fdAT sequence counter), the still-decoder poster fallback, the
  * format-blind video dispatch, and cross-container GIF identity. */
class ApngSpec extends SparkSpec {

  private def opaque(w: Int, h: Int, g: (Int, Int) => Int): Int => Int =
    i => if (i % 4 == 3) 255 else g((i / 4) % w, (i / 4) / w)

  test("APNG composites the dispose/blend matrix exactly (the q284 algebra)") {
    for (id <- Seq(2L, 3L)) { // one even (dispose none), one odd (background)
      def g0(x: Int, y: Int) = (((id * 23 + x * 3 + y * 5) % 64) * 4 + 1).toInt
      def g1(lx: Int, ly: Int) = (((id * 7 + lx * 5 + ly * 3) % 63) * 4 + 1).toInt
      def g2(lx: Int, ly: Int) = (((id * 11 + lx * 7 + ly * 9) % 64) * 4 + 1).toInt
      val p = Containers.pngAnimated(16, 16, Seq(
        ApngFrameSpec(0, 0, 16, 16, opaque(16, 16, g0),
          dispose = if (id % 2 == 0) 0 else 1, filterType = (id % 5).toInt),
        ApngFrameSpec(4, 4, 8, 8, { i =>
          val k = i / 4; val lx = k % 8; val ly = k / 8
          if ((lx + ly) % 3 == 0) 0
          else if (i % 4 == 3) 255 else g1(lx, ly)
        }, dispose = 2, blend = 1),
        ApngFrameSpec(8, 0, 8, 8, opaque(8, 8, g2))))
      val (w, h, frames) = Multimodal.decodeApngFrames(id, p)
      assert((w, h) === ((16, 16)) && frames.length === 3)
      def base(x: Int, y: Int) = if (id % 2 == 0) g0(x, y) else 0
      def expected(f: Int, x: Int, y: Int): Int =
        if (f == 0) g0(x, y)
        else if (f == 1 && x >= 4 && x <= 11 && y >= 4 && y <= 11 &&
          ((x - 4) + (y - 4)) % 3 != 0) g1(x - 4, y - 4)
        else if (f == 2 && x >= 8 && y < 8) g2(x - 8, y)
        else base(x, y)
      for (f <- 0 until 3; y <- 0 until 16; x <- 0 until 16) {
        val o = 3 * (y * 16 + x)
        assert((frames(f)(o) & 0xFF) === expected(f, x, y),
          s"id=$id frame $f ($x,$y)")
      }
    }
  }

  test("fractional-alpha OVER uses the deterministic integer form") {
    // dst opaque 100, src alpha 128 value 200:
    // oa = 128 + 255·127/255 = 255; out = (200·128·255 + 100·255·127)
    //      / (255·255) = (200·128 + 100·127) / 255 = 150 (integer div)
    val p = Containers.pngAnimated(2, 1, Seq(
      ApngFrameSpec(0, 0, 2, 1, i => if (i % 4 == 3) 255 else 100),
      ApngFrameSpec(0, 0, 2, 1, { i =>
        if (i % 4 == 3) 128 else 200
      }, blend = 1)))
    val (_, _, frames) = Multimodal.decodeApngFrames(5L, p)
    val expect = (200 * 128 + 100 * 127) / 255
    assert((frames(1)(0) & 0xFF) === expect)
    assert((frames(1)(3) & 0xFF) === expect)
  }

  test("a bare IDAT is a poster image, not a frame; the still decoder " +
    "reads the default image of any APNG") {
    // hand-build: IHDR, acTL, IDAT (no fcTL before it), fcTL+fdAT frame
    val full = Containers.pngAnimated(6, 4, Seq(
      ApngFrameSpec(0, 0, 6, 4, i => if (i % 4 == 3) 255 else (i * 7) % 256),
      ApngFrameSpec(1, 1, 3, 2, i => if (i % 4 == 3) 255 else (i * 11) % 256,
        blend = 0)))
    // the encoder always animates the default image; the still decoder
    // must read it (ancillary acTL/fcTL/fdAT chunks skipped by spec)
    val (sw, sh, spx) = Multimodal.decodePngRgba(7L, full)
    assert((sw, sh) === ((6, 4)))
    for (k <- 0 until 6 * 4 * 4 if k % 4 != 3)
      assert((spx(k) & 0xFF) === (k * 7) % 256, s"poster byte $k")
    // hasApng routes the video dispatch; a plain PNG stays a still
    assert(Multimodal.hasApng(full))
    assert(!Multimodal.hasApng(Containers.pngFull(4, 3, i => i % 256)))
    val (_, _, vf) = Multimodal.decodeVideoRgb(7L, full)
    assert(vf.length === 2)
  }

  test("APNG sequence-number and structure violations fail by name") {
    val good = Containers.pngAnimated(8, 6, Seq(
      ApngFrameSpec(0, 0, 8, 6, i => if (i % 4 == 3) 255 else i % 256),
      ApngFrameSpec(2, 2, 4, 2, i => if (i % 4 == 3) 255 else (i + 5) % 256)))
    // corrupt the SECOND frame's fcTL sequence number (find the second
    // fcTL chunk and bump its trailing seq byte)
    def findChunk(p: Array[Byte], typ: String, nth: Int): Int = {
      var off = 8; var seen = 0
      while (off + 8 <= p.length) {
        val len = ((p(off) & 0xFF) << 24) | ((p(off + 1) & 0xFF) << 16) |
          ((p(off + 2) & 0xFF) << 8) | (p(off + 3) & 0xFF)
        if (new String(p, off + 4, 4, "US-ASCII") == typ) {
          seen += 1
          if (seen == nth) return off
        }
        off += 12 + len
      }
      -1
    }
    val badSeq = good.clone()
    val f2 = findChunk(badSeq, "fcTL", 2)
    badSeq(f2 + 11) = (badSeq(f2 + 11) + 3).toByte
    val e1 = intercept[IllegalArgumentException](
      Multimodal.decodeApngFrames(9L, badSeq))
    assert(e1.getMessage.contains("sequence number"), e1.getMessage)
    // frame rect escaping the canvas
    val badRect = good.clone()
    badRect(f2 + 8 + 12 + 3) = 7 // x_offset 2 -> 7: 7 + 4 > 8
    val e2 = intercept[IllegalArgumentException](
      Multimodal.decodeApngFrames(10L, badRect))
    assert(e2.getMessage.contains("exceeds"), e2.getMessage)
    // acTL frame count disagreeing with the fcTL count
    val badCount = good.clone()
    val actl = findChunk(badCount, "acTL", 1)
    badCount(actl + 11) = 5
    val e3 = intercept[IllegalArgumentException](
      Multimodal.decodeApngFrames(11L, badCount))
    assert(e3.getMessage.contains("declares"), e3.getMessage)
  }

  test("an IDAT arriving AFTER fdAT data is rejected by name, even in " +
    "the bare-poster layout (one fcTL seen)") {
    // hand-build the malformed interleaving: IHDR, acTL, IDAT (bare
    // poster), fcTL(0), fdAT(1), then a LATE IDAT — pre-fix those
    // poster bytes were appended to frame 0's stream and surfaced as a
    // downstream zlib error instead of a named rejection
    val w = 6; val h = 4
    val donor = Containers.pngFull(w, h, i =>
      if (i % 4 == 3) 255 else (i * 7) % 256)
    def harvest(typ: String): Array[Byte] = {
      var off = 8
      while (off + 8 <= donor.length) {
        val len = ((donor(off) & 0xFF) << 24) | ((donor(off + 1) & 0xFF) << 16) |
          ((donor(off + 2) & 0xFF) << 8) | (donor(off + 3) & 0xFF)
        if (new String(donor, off + 4, 4, "US-ASCII") == typ)
          return java.util.Arrays.copyOfRange(donor, off + 8, off + 8 + len)
        off += 12 + len
      }
      fail(s"donor PNG lacks $typ")
    }
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + data.length)
      bb.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes("US-ASCII")); crc.update(data)
      bb.putInt(crc.getValue.toInt)
      bb.array()
    }
    val ihdr = harvest("IHDR"); val idat = harvest("IDAT")
    def be4(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    val actl = be4(1) ++ be4(0)
    val fctl0 = be4(0) ++ be4(w) ++ be4(h) ++ be4(0) ++ be4(0) ++
      Array[Byte](0, 1, 0, 100, 0, 0)
    val fdat1 = be4(1) ++ idat
    def assemble(withLateIdat: Boolean): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(donor, 0, 8) // PNG signature
      out.write(chunk("IHDR", ihdr)); out.write(chunk("acTL", actl))
      out.write(chunk("IDAT", idat)) // bare poster (no fcTL before it)
      out.write(chunk("fcTL", fctl0)); out.write(chunk("fdAT", fdat1))
      if (withLateIdat) out.write(chunk("IDAT", idat))
      out.write(chunk("IEND", Array.emptyByteArray))
      out.toByteArray
    }
    val e = intercept[IllegalArgumentException](
      Multimodal.decodeApngFrames(12L, assemble(withLateIdat = true)))
    assert(e.getMessage.contains("IDAT after fdAT"), e.getMessage)
    // the clean bare-poster layout still decodes: one fdAT-fed frame
    val (cw, ch, frames) =
      Multimodal.decodeApngFrames(12L, assemble(withLateIdat = false))
    assert((cw, ch) === ((w, h)) && frames.length === 1)
    // frames are RGB; the donor generator indexed RGBA bytes
    for (k <- 0 until w * h * 3)
      assert((frames(0)(k) & 0xFF) === ((k / 3 * 4 + k % 3) * 7) % 256,
        s"frame byte $k")
  }

  test("GIF and APNG of the same planted frames decode to identical RGB " +
    "through the format-blind video dispatch") {
    val g = 4L
    val w = 10; val h = 8; val nf = 3
    def v(f: Int, x: Int, y: Int): Int =
      ((g * 37 + f * 13 + x * x * 5 + y * y * 3 + x * y * 7) % 256).toInt
    val grayPalette = Array.tabulate(256 * 3)(b => (b / 3).toByte)
    val gif = Containers.gifAnimated(w, h, nf, (f, k) => v(f, k % w, k / w),
      grayPalette, minCodeSize = 8)
    val apng = Containers.pngAnimated(w, h, (0 until nf).map { f =>
      ApngFrameSpec(0, 0, w, h, opaque(w, h, (x, y) => v(f, x, y)),
        filterType = f % 5)
    })
    val (gw, gh, gf) = Multimodal.decodeVideoRgb(100L, gif)
    val (aw, ah, af) = Multimodal.decodeVideoRgb(101L, apng)
    assert((gw, gh) === ((aw, ah)) && gf.length === af.length)
    for (f <- 0 until nf)
      assert(java.util.Arrays.equals(gf(f), af(f)), s"frame $f")
  }

  test("the q285 cross-container pairs collide at match_frac 1 on the " +
    "spark surface") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(40)
    val pairs = MediaDedup.videoNearDups(
      MediaDedup.syntheticGifApngPairVideos(docs), everyN = 2,
      maxHamming = 3, bands = 4, minSharedFrac = 0.5)
      .select(col("media_a"), col("media_b"), col("match_frac"))
      .collect()
    val ids = docs.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val expected = ids.map(_ / 2).toSeq.map(g => (2 * g, 2 * g + 1))
      .filter { case (a, b) => ids.contains(a) && ids.contains(b) }
    assert(pairs.length === expected.size,
      s"got ${pairs.map(r => (r.getLong(0), r.getLong(1))).mkString(", ")}")
    pairs.foreach { r =>
      assert(r.getLong(1) === r.getLong(0) + 1)
      assert(r.getDouble(2) === 1.0)
    }
  }
}
