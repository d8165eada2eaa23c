package graft.multimodal

/** Uncompressed raster formats — BMP and baseline TIFF: pure public byte
  * layouts (no entropy coding at all), so full decode membership in the
  * format-blind image surface (dHash dedup, crop containment, quality
  * gates, descriptors, boilerplate census) costs one header walk each.
  *
  * BMP: BITMAPFILEHEADER + BITMAPINFOHEADER (Windows BMP v3+ — the
  * layout every paint program has written since 1990). BI_RGB only;
  * bit counts 8 (palette), 24 (BGR), 32 (BGRx, fourth byte reserved and
  * ignored exactly as viewers and ImageIO do). Rows pad to 4 bytes and
  * store BOTTOM-UP unless the height is negative (top-down) — the
  * classic flip bug is position-sensitive, which is why the oracle row
  * censuses block means, not channel sums.
  *
  * TIFF 6.0 baseline, uncompressed: II/MM byte order (both decoded — a
  * byte-order bug halves every dimension read), IFD entry walk,
  * strip-organized sample data (chunky planar config), photometric 0
  * (WhiteIsZero — inverted gray), 1 (BlackIsZero), 2 (RGB, 3 or 4
  * samples), 3 (palette via the 16-bit ColorMap, high byte per spec).
  * Every out-of-scope shape (LZW/PackBits/JPEG compression, non-8-bit
  * samples, planar config 2) fails by NAME into the q265 health census.
  *
  * Reference behavior studied from zinahalqeji/beauty_lakehouse (media
  * columns are opaque binaries there); layouts from the public
  * Windows BMP and Adobe TIFF 6.0 specifications. */
private[graft] object Raster {
  import Multimodal.MaxDecodePixels

  // ------------------------------------------------------------------
  // BMP decode
  // ------------------------------------------------------------------

  private[graft] def isBmp(p: Array[Byte]): Boolean =
    p.length >= 2 && p(0) == 'B'.toByte && p(1) == 'M'.toByte

  private[graft] def isTiff(p: Array[Byte]): Boolean =
    p.length >= 4 &&
      ((p(0) == 'I'.toByte && p(1) == 'I'.toByte && p(2) == 42 && p(3) == 0) ||
        (p(0) == 'M'.toByte && p(1) == 'M'.toByte && p(2) == 0 && p(3) == 42))

  /** Decode one BMP to row-major top-down RGBA (the [[Multimodal
    * .decodePngRgba]] layout, so the shared pixel walk is format-blind). */
  private[graft] def decodeBmpRgba(id: Long, p: Array[Byte]): (Int, Int, Array[Byte]) = {
    def le16(off: Int): Int = (p(off) & 0xFF) | ((p(off + 1) & 0xFF) << 8)
    def le32(off: Int): Int = le16(off) | (le16(off + 2) << 16)
    require(isBmp(p) && p.length >= 54, s"media $id: not a BMP header")
    val offBits = le32(10)
    val biSize = le32(14)
    // 40 = BITMAPINFOHEADER; 52/56/108/124 (v2–v5) share its first 40
    // bytes — older 12-byte CORE headers have a different field layout
    // and are long-extinct, so they fail by name instead of misparsing
    require(biSize >= 40, s"media $id: BMP header size $biSize out of " +
      "scope (only BITMAPINFOHEADER v3+ layouts)")
    require(14L + biSize <= p.length, s"media $id: truncated BMP header")
    val w = le32(18)
    val hRaw = le32(22)
    val topDown = hRaw < 0
    val h = if (topDown) -hRaw else hRaw
    require(w > 0 && h > 0, s"media $id: bad BMP dims ${w}x$hRaw")
    require(w.toLong * h <= MaxDecodePixels,
      s"media $id: ${w}x$h exceeds the $MaxDecodePixels-pixel decode bound")
    val bitCount = le16(28)
    val compression = le32(30)
    require(compression == 0,
      s"media $id: only BI_RGB BMP supported, got compression " +
        s"$compression (RLE/bitfields out of scope)")
    require(bitCount == 8 || bitCount == 24 || bitCount == 32,
      s"media $id: only 8-, 24- and 32-bit BMP bit counts supported, " +
        s"got $bitCount")
    // 8-bit palette: BGRx quads right after the info header; 0 clrUsed
    // means the full 256 entries per spec
    var palette: Array[Byte] = null
    if (bitCount == 8) {
      val clrUsed = le32(46)
      require(clrUsed >= 0 && clrUsed <= 256,
        s"media $id: bad BMP palette size $clrUsed")
      val n = if (clrUsed == 0) 256 else clrUsed
      val palOff = 14 + biSize
      require(palOff.toLong + 4L * n <= p.length,
        s"media $id: truncated BMP palette")
      palette = java.util.Arrays.copyOfRange(p, palOff, palOff + 4 * n)
    }
    val bytesPerPx = bitCount / 8
    val rowSize = ((bytesPerPx * w + 3) / 4) * 4
    require(offBits >= 0 && offBits.toLong + rowSize.toLong * h <= p.length,
      s"media $id: truncated BMP pixel data")
    val out = new Array[Byte](4 * w * h)
    var y = 0
    while (y < h) {
      val srcRow = offBits + (if (topDown) y else h - 1 - y) * rowSize
      var x = 0
      while (x < w) {
        val o = 4 * (y * w + x)
        if (bitCount == 8) {
          val idx = p(srcRow + x) & 0xFF
          require(4 * idx + 2 < palette.length,
            s"media $id: pixel index $idx outside the " +
              s"${palette.length / 4}-entry BMP palette")
          out(o) = palette(4 * idx + 2) // stored BGRx
          out(o + 1) = palette(4 * idx + 1)
          out(o + 2) = palette(4 * idx)
          out(o + 3) = 255.toByte
        } else {
          val s = srcRow + bytesPerPx * x
          out(o) = p(s + 2) // BGR(x) -> RGB
          out(o + 1) = p(s + 1)
          out(o + 2) = p(s)
          // 32-bit BI_RGB's fourth byte is RESERVED (not alpha) — every
          // viewer and ImageIO render it opaque, so the decode does too
          out(o + 3) = 255.toByte
        }
        x += 1
      }
      y += 1
    }
    (w, h, out)
  }

  // ------------------------------------------------------------------
  // TIFF decode
  // ------------------------------------------------------------------

  /** Decode one baseline uncompressed TIFF to row-major RGBA. */
  private[graft] def decodeTiffRgba(id: Long, p: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(isTiff(p) && p.length >= 8, s"media $id: not a TIFF header")
    val be = p(0) == 'M'.toByte
    def u16(off: Int): Int = {
      require(off >= 0 && off + 2 <= p.length, s"media $id: truncated TIFF")
      if (be) ((p(off) & 0xFF) << 8) | (p(off + 1) & 0xFF)
      else (p(off) & 0xFF) | ((p(off + 1) & 0xFF) << 8)
    }
    def u32(off: Int): Long = {
      require(off >= 0 && off + 4 <= p.length, s"media $id: truncated TIFF")
      if (be) (u16(off).toLong << 16) | u16(off + 2)
      else u16(off).toLong | (u16(off + 2).toLong << 16)
    }
    val ifdOff = u32(4)
    require(ifdOff >= 8 && ifdOff + 2 <= p.length,
      s"media $id: TIFF IFD offset $ifdOff out of bounds")
    val nEntries = u16(ifdOff.toInt)
    require(nEntries > 0 && nEntries <= 256,
      s"media $id: implausible TIFF IFD entry count $nEntries")
    require(ifdOff + 2 + 12L * nEntries <= p.length,
      s"media $id: truncated TIFF IFD")
    // tag -> (fieldType, count, offset of the 4-byte value cell)
    val entries = scala.collection.mutable.LongMap.empty[(Int, Long, Int)]
    var i = 0
    while (i < nEntries) {
      val e = ifdOff.toInt + 2 + 12 * i
      entries(u16(e).toLong) = (u16(e + 2), u32(e + 4), e + 8)
      i += 1
    }
    // SHORT(3)/LONG(4) scalar-or-array reader: values <= 4 bytes live in
    // the cell itself, larger arrays at the cell's offset (TIFF 6.0 §2)
    def values(tag: Int): Array[Long] = entries.get(tag.toLong) match {
      case None => null
      case Some((typ, count, cell)) =>
        require(typ == 3 || typ == 4,
          s"media $id: TIFF tag $tag has field type $typ (only " +
            "SHORT/LONG supported)")
        require(count >= 1 && count <= (1 << 20),
          s"media $id: implausible TIFF tag $tag count $count")
        val width = if (typ == 3) 2 else 4
        val base =
          if (count * width <= 4) cell.toLong
          else {
            val off = u32(cell)
            require(off + count * width <= p.length,
              s"media $id: TIFF tag $tag value array out of bounds")
            off
          }
        Array.tabulate(count.toInt)(k =>
          if (typ == 3) u16((base + 2L * k).toInt).toLong
          else u32((base + 4L * k).toInt))
    }
    def scalar(tag: Int, default: Long = -1L): Long = {
      val v = values(tag)
      if (v == null) default else v(0)
    }
    val w = scalar(256)
    val h = scalar(257)
    require(w > 0 && h > 0, s"media $id: missing TIFF dimensions")
    require(w * h <= MaxDecodePixels,
      s"media $id: ${w}x$h exceeds the $MaxDecodePixels-pixel decode bound")
    val compression = scalar(259, 1L)
    require(compression == 1,
      s"media $id: only uncompressed TIFF supported (compression 1), " +
        s"got $compression")
    val photometric = scalar(262)
    require(photometric >= 0 && photometric <= 3,
      s"media $id: TIFF photometric $photometric out of scope " +
        "(0/1 gray, 2 RGB, 3 palette)")
    val spp = scalar(277, 1L).toInt
    require(if (photometric == 2) spp == 3 || spp == 4 else spp == 1,
      s"media $id: TIFF samples-per-pixel $spp incompatible with " +
        s"photometric $photometric")
    val planar = scalar(284, 1L)
    require(planar == 1,
      s"media $id: only chunky TIFF planar configuration supported, " +
        s"got $planar")
    val bits = values(258)
    require(bits == null || bits.forall(_ == 8),
      s"media $id: only 8-bit TIFF samples supported, got " +
        s"${if (bits == null) "" else bits.mkString("/")}")
    require(bits != null || photometric == 2 || spp == 1,
      s"media $id: TIFF BitsPerSample missing")
    // gray/palette data with no 258 tag defaults to 1 bit — out of scope
    require(bits != null,
      s"media $id: only 8-bit TIFF samples supported, got default 1")
    var colorMap: Array[Long] = null
    if (photometric == 3) {
      colorMap = values(320)
      require(colorMap != null && colorMap.length == 3 * 256,
        s"media $id: palette TIFF needs a 3x256-entry ColorMap, got " +
          s"${if (colorMap == null) 0 else colorMap.length}")
    }
    val stripOffsets = values(273)
    val stripCounts = values(279)
    require(stripOffsets != null && stripCounts != null &&
      stripOffsets.length == stripCounts.length,
      s"media $id: TIFF strip offsets/byte-counts missing or mismatched")
    val rps = scalar(278, h)
    require(rps > 0, s"media $id: bad TIFF RowsPerStrip $rps")
    val nStrips = ((h + rps - 1) / rps).toInt
    require(stripOffsets.length == nStrips,
      s"media $id: TIFF declares ${stripOffsets.length} strips, " +
        s"geometry needs $nStrips")
    val wi = w.toInt; val hi = h.toInt
    val rowBytes = wi * spp
    val out = new Array[Byte](4 * wi * hi)
    var strip = 0
    while (strip < nStrips) {
      val rows = math.min(rps, h - strip * rps).toInt
      require(stripCounts(strip) == rows.toLong * rowBytes,
        s"media $id: TIFF strip $strip carries ${stripCounts(strip)} " +
          s"bytes, geometry needs ${rows.toLong * rowBytes}")
      val off = stripOffsets(strip)
      require(off >= 0 && off + stripCounts(strip) <= p.length,
        s"media $id: truncated TIFF strip $strip")
      var r = 0
      while (r < rows) {
        val y = strip * rps.toInt + r
        val src = off.toInt + r * rowBytes
        var x = 0
        while (x < wi) {
          val o = 4 * (y * wi + x)
          photometric match {
            case 0 | 1 =>
              val v0 = p(src + x) & 0xFF
              val g = (if (photometric == 0) 255 - v0 else v0).toByte
              out(o) = g; out(o + 1) = g; out(o + 2) = g
              out(o + 3) = 255.toByte
            case 3 =>
              val idx = p(src + x) & 0xFF
              // ColorMap entries are 16-bit; the 8-bit view is the high
              // byte (TIFF 6.0 §5: 0 -> 0, 65535 -> 255)
              out(o) = (colorMap(idx) >> 8).toByte
              out(o + 1) = (colorMap(256 + idx) >> 8).toByte
              out(o + 2) = (colorMap(512 + idx) >> 8).toByte
              out(o + 3) = 255.toByte
            case _ =>
              val s = src + spp * x
              out(o) = p(s); out(o + 1) = p(s + 1); out(o + 2) = p(s + 2)
              out(o + 3) = if (spp == 4) p(s + 3) else 255.toByte
          }
          x += 1
        }
        r += 1
      }
      strip += 1
    }
    (wi, hi, out)
  }

  // ------------------------------------------------------------------
  // Encoders (fixture side)
  // ------------------------------------------------------------------

  /** 24-bit BI_RGB BMP: `px(k)` supplies the k-th RGB channel byte in
    * row-major TOP-DOWN order (3·w·h values); the encoder writes the
    * spec's bottom-up padded BGR rows (or top-down via negative height
    * when `topDown`) — the decoder must undo both reorderings. */
  private[graft] def bmp24(width: Int, height: Int, px: Int => Int,
                           topDown: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0, "bmp24 needs positive dims")
    val rowSize = ((3 * width + 3) / 4) * 4
    encodeBmp(width, height, 24, rowSize, topDown, null) { (row, y) =>
      var x = 0
      while (x < width) {
        row(3 * x) = px((y * width + x) * 3 + 2).toByte // B
        row(3 * x + 1) = px((y * width + x) * 3 + 1).toByte // G
        row(3 * x + 2) = px((y * width + x) * 3).toByte // R
        x += 1
      }
    }
  }

  /** 32-bit BI_RGB BMP (BGRx quads, fourth byte written as given but
    * RESERVED per spec — the decoder ignores it). `px` as [[bmp24]]. */
  private[graft] def bmp32(width: Int, height: Int, px: Int => Int,
                           reserved: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0, "bmp32 needs positive dims")
    encodeBmp(width, height, 32, 4 * width, topDown = false, null) { (row, y) =>
      var x = 0
      while (x < width) {
        row(4 * x) = px((y * width + x) * 3 + 2).toByte
        row(4 * x + 1) = px((y * width + x) * 3 + 1).toByte
        row(4 * x + 2) = px((y * width + x) * 3).toByte
        row(4 * x + 3) = reserved.toByte
        x += 1
      }
    }
  }

  /** 8-bit palette BMP: `idx(k)` is the pixel's palette index in
    * row-major top-down order; `palette` holds RGB triples (converted to
    * the header's BGRx quads). */
  private[graft] def bmp8(width: Int, height: Int, idx: Int => Int,
                          palette: Array[Byte],
                          topDown: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0, "bmp8 needs positive dims")
    require(palette.length % 3 == 0 && palette.length <= 3 * 256,
      "palette holds <= 256 RGB triples")
    val rowSize = ((width + 3) / 4) * 4
    encodeBmp(width, height, 8, rowSize, topDown, palette) { (row, y) =>
      var x = 0
      while (x < width) {
        row(x) = idx(y * width + x).toByte
        x += 1
      }
    }
  }

  private def encodeBmp(width: Int, height: Int, bitCount: Int,
                        rowSize: Int, topDown: Boolean,
                        rgbPalette: Array[Byte])
                       (fill: (Array[Byte], Int) => Unit): Array[Byte] = {
    val nPal = if (rgbPalette == null) 0 else rgbPalette.length / 3
    val offBits = 14 + 40 + 4 * nPal
    val size = offBits + rowSize * height
    val out = new Array[Byte](size)
    def le16(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
    }
    def le32(off: Int, v: Int): Unit = {
      le16(off, v & 0xFFFF); le16(off + 2, (v >> 16) & 0xFFFF)
    }
    out(0) = 'B'.toByte; out(1) = 'M'.toByte
    le32(2, size); le32(10, offBits)
    le32(14, 40) // BITMAPINFOHEADER
    le32(18, width); le32(22, if (topDown) -height else height)
    le16(26, 1); le16(28, bitCount)
    le32(30, 0) // BI_RGB
    le32(34, rowSize * height)
    le32(38, 2835); le32(42, 2835) // 72 dpi
    le32(46, nPal); le32(50, 0)
    var pi = 0
    while (pi < nPal) {
      out(54 + 4 * pi) = rgbPalette(3 * pi + 2) // B
      out(54 + 4 * pi + 1) = rgbPalette(3 * pi + 1) // G
      out(54 + 4 * pi + 2) = rgbPalette(3 * pi) // R
      pi += 1
    }
    val row = new Array[Byte](rowSize)
    var y = 0
    while (y < height) {
      java.util.Arrays.fill(row, 0.toByte)
      fill(row, y)
      val dst = offBits + (if (topDown) y else height - 1 - y) * rowSize
      System.arraycopy(row, 0, out, dst, rowSize)
      y += 1
    }
    out
  }

  /** Baseline uncompressed TIFF: `sample(k)` supplies the k-th sample
    * byte in row-major chunky order (h·w·spp values). `photometric`
    * 0/1 gray (spp 1), 2 RGB (spp 3 or 4 — the fourth sample is an
    * unassociated alpha declared via ExtraSamples), 3 palette (spp 1,
    * `palette` = 3·256 RGB bytes expanded to the spec's 16-bit ColorMap
    * as v·257 so the high-byte reduction round-trips exactly).
    * `bigEndian` writes the MM layout; `rowsPerStrip` 0 = one strip. */
  private[graft] def tiff(width: Int, height: Int, photometric: Int,
                          spp: Int, sample: Int => Int,
                          bigEndian: Boolean = false,
                          rowsPerStrip: Int = 0,
                          palette: Array[Byte] = null): Array[Byte] = {
    require(width > 0 && height > 0, "tiff needs positive dims")
    require(photometric >= 0 && photometric <= 3, "photometric 0..3")
    require(if (photometric == 2) spp == 3 || spp == 4 else spp == 1,
      "spp 3/4 for RGB, 1 otherwise")
    require((photometric == 3) == (palette != null), "palette iff photometric 3")
    val rps = if (rowsPerStrip <= 0) height else rowsPerStrip
    val nStrips = (height + rps - 1) / rps
    val rowBytes = width * spp
    final case class Entry(tag: Int, typ: Int, count: Int, value: Long,
                           array: Array[Long] = null)
    val entryList = scala.collection.mutable.ArrayBuffer.empty[Entry]
    entryList += Entry(256, 4, 1, width)
    entryList += Entry(257, 4, 1, height)
    entryList += Entry(258, 3, spp, 8,
      if (spp > 1) Array.fill(spp)(8L) else null)
    entryList += Entry(259, 3, 1, 1)
    entryList += Entry(262, 3, 1, photometric)
    entryList += Entry(273, 4, nStrips, 0,
      if (nStrips > 1) new Array[Long](nStrips) else null) // patched below
    entryList += Entry(277, 3, 1, spp)
    entryList += Entry(278, 4, 1, rps)
    entryList += Entry(279, 4, nStrips, 0,
      if (nStrips > 1) new Array[Long](nStrips) else null)
    if (spp == 4) entryList += Entry(338, 3, 1, 2) // unassociated alpha
    if (photometric == 3)
      entryList += Entry(320, 3, 3 * 256, 0, new Array[Long](3 * 256))
    val entries = entryList.sortBy(_.tag).toArray
    // layout: 8-byte header | IFD (2 + 12n + 4) | overflow arrays | strips
    val ifdOff = 8
    val ifdLen = 2 + 12 * entries.length + 4
    var overflowOff = ifdOff + ifdLen
    val overflowAt = entries.map { e =>
      val width = if (e.typ == 3) 2 else 4
      if (e.count * width > 4) {
        val at = overflowOff
        overflowOff += e.count * width
        overflowOff = (overflowOff + 1) & ~1 // word-align, per spec
        at
      } else -1
    }
    val dataOff = overflowOff
    val stripOffsets = Array.tabulate(nStrips)(s => (dataOff + s.toLong * rps * rowBytes))
    val stripCounts = Array.tabulate(nStrips)(s =>
      math.min(rps, height - s * rps).toLong * rowBytes)
    // patch the strip tags now that the layout is known
    entries.indices.foreach { k =>
      entries(k).tag match {
        case 273 =>
          if (entries(k).array != null)
            System.arraycopy(stripOffsets, 0, entries(k).array, 0, nStrips)
          else entries(k) = entries(k).copy(value = stripOffsets(0))
        case 279 =>
          if (entries(k).array != null)
            System.arraycopy(stripCounts, 0, entries(k).array, 0, nStrips)
          else entries(k) = entries(k).copy(value = stripCounts(0))
        case 320 =>
          var c = 0
          while (c < 3 * 256) {
            val channel = c / 256; val idx = c % 256
            val v = if (3 * idx + channel < palette.length)
              palette(3 * idx + channel) & 0xFF else 0
            entries(k).array(c) = v * 257L // v<<8 | v: high byte round-trips
            c += 1
          }
        case _ => ()
      }
    }
    val out = new Array[Byte](dataOff + height * rowBytes)
    def put16(off: Int, v: Int): Unit =
      if (bigEndian) { out(off) = (v >> 8).toByte; out(off + 1) = v.toByte }
      else { out(off) = v.toByte; out(off + 1) = (v >> 8).toByte }
    def put32(off: Int, v: Long): Unit =
      if (bigEndian) { put16(off, ((v >> 16) & 0xFFFF).toInt); put16(off + 2, (v & 0xFFFF).toInt) }
      else { put16(off, (v & 0xFFFF).toInt); put16(off + 2, ((v >> 16) & 0xFFFF).toInt) }
    if (bigEndian) { out(0) = 'M'.toByte; out(1) = 'M'.toByte; out(2) = 0; out(3) = 42 }
    else { out(0) = 'I'.toByte; out(1) = 'I'.toByte; out(2) = 42; out(3) = 0 }
    put32(4, ifdOff)
    put16(ifdOff, entries.length)
    entries.indices.foreach { k =>
      val e = entries(k)
      val at = ifdOff + 2 + 12 * k
      put16(at, e.tag); put16(at + 2, e.typ); put32(at + 4, e.count)
      val tw = if (e.typ == 3) 2 else 4
      if (e.count * tw <= 4) {
        // inline value, left-justified in the 4-byte cell per spec
        val vs = if (e.array != null) e.array else Array(e.value)
        var j = 0
        while (j < e.count) {
          if (e.typ == 3) put16(at + 8 + 2 * j, vs(j).toInt)
          else put32(at + 8 + 4 * j, vs(j))
          j += 1
        }
      } else {
        put32(at + 8, overflowAt(k))
        val vs = e.array
        var j = 0
        while (j < e.count) {
          if (e.typ == 3) put16(overflowAt(k) + 2 * j, vs(j).toInt)
          else put32(overflowAt(k) + 4 * j, vs(j))
          j += 1
        }
      }
    }
    put32(ifdOff + 2 + 12 * entries.length, 0) // no next IFD
    var k = 0
    val n = height * rowBytes
    while (k < n) { out(dataOff + k) = sample(k).toByte; k += 1 }
    out
  }
}
