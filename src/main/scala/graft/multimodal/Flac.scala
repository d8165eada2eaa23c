package graft.multimodal

/** REAL FLAC codec — no media library: FLAC (RFC 9639, a published IETF
  * spec) is fixed linear prediction + Rice-coded residuals, all pure
  * integer arithmetic, and LOSSLESS — so a decoded clip replays any
  * planted sample formula EXACTLY, the same oracle contract as the LZW
  * and JPEG DC-only paths. This closes the "lossless audio beyond PCM16
  * WAV" gap: a FLAC re-encode of a committed WAV clip decodes to the SAME
  * samples, so every downstream audio operator (energy contour dedup,
  * quality gates, containment search, descriptors) is format-blind once
  * the sample decode dispatches on magic.
  *
  * Decoder profile (restrictions FAIL FAST by name, the package
  * contract): 16-bit streams of 1–8 channels with fixed blocking
  * strategy — mono, all four STEREO channel assignments (independent,
  * left/side, right/side, mid/side — the side channel carries its
  * spec'd extra bit), and 3–8 INDEPENDENT channels (surround rips
  * interleave in channel order); subframe types CONSTANT, VERBATIM, FIXED orders
  * 0–4, and general LPC orders 1–32 (quantized-coefficient integer
  * prediction with a non-negative shift — still pure integer, still
  * lossless); Rice residual methods 0 (4-bit params) and 1 (5-bit
  * params) including escaped raw-bits partitions and multi-partition
  * orders. Real-world FLAC is almost always stereo LPC, so this is the
  * profile a crawl actually exercises. Frame header CRC-8 and frame
  * CRC-16 are VERIFIED (polynomials 0x07 and 0x8005 — published
  * constants), so bit corruption fails by name rather than decoding
  * garbage.
  *
  * Untrusted-bytes contract (the streaming-ingest path): every read is
  * bounds-checked, loops are bounded by the declared sample/partition
  * counts, failures carry "media <id>: cause", and FuzzSpec drives
  * hostile bytes at the walk.
  */
private[graft] object Flac {

  // ------------------------------------------------------------------
  // CRCs (published FLAC polynomials)
  // ------------------------------------------------------------------

  private val Crc8Table: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i
      var b = 0
      while (b < 8) { c = if ((c & 0x80) != 0) (c << 1) ^ 0x07 else c << 1; b += 1 }
      t(i) = c & 0xFF
      i += 1
    }
    t
  }

  private val Crc16Table: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i << 8
      var b = 0
      while (b < 8) {
        c = if ((c & 0x8000) != 0) (c << 1) ^ 0x8005 else c << 1
        b += 1
      }
      t(i) = c & 0xFFFF
      i += 1
    }
    t
  }

  private def crc8(p: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) { c = Crc8Table(c ^ (p(i) & 0xFF)); i += 1 }
    c
  }

  private def crc16(p: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) { c = Crc16Table(((c >> 8) ^ (p(i) & 0xFF)) & 0xFF) ^ ((c << 8) & 0xFFFF); i += 1 }
    c
  }

  // ------------------------------------------------------------------
  // Bit reader (MSB-first, the FLAC bit order)
  // ------------------------------------------------------------------

  private final class BitReader(id: Long, p: Array[Byte], startByte: Int) {
    private var pos = startByte
    private var bit = 0 // 0..7, MSB first

    def bytePos: Int = pos
    def align(): Unit = if (bit != 0) { bit = 0; pos += 1 }

    def readBit(): Int = {
      require(pos < p.length, s"media $id: truncated FLAC bitstream")
      val v = (p(pos) >> (7 - bit)) & 1
      bit += 1
      if (bit == 8) { bit = 0; pos += 1 }
      v
    }

    def readBits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }

    def readSigned(n: Int): Int = {
      val v = readBits(n)
      if (n == 0) 0
      else if ((v & (1L << (n - 1))) != 0) (v - (1L << n)).toInt else v.toInt
    }

    /** Unary: count of 0 bits before the terminating 1 (bounded by the
      * payload — readBit names truncation). */
    def readUnary(): Int = {
      var q = 0
      while (readBit() == 0) {
        q += 1
        require(q <= (p.length.toLong * 8),
          s"media $id: runaway unary code") // unreachable; readBit bounds first
      }
      q
    }
  }

  /** Fixed-predictor reconstruction: x[i] = residual + prediction from
    * the last `order` samples (RFC 9639 §9.2.2 coefficient rows). */
  private def predictFixed(order: Int, x: Array[Int], i: Int): Int = order match {
    case 0 => 0
    case 1 => x(i - 1)
    case 2 => 2 * x(i - 1) - x(i - 2)
    case 3 => 3 * x(i - 1) - 3 * x(i - 2) + x(i - 3)
    case _ => 4 * x(i - 1) - 6 * x(i - 2) + 4 * x(i - 3) - x(i - 4)
  }

  /** Decode one subframe of `blockSize` samples at `bps` bits (17 for a
    * side channel) from the shared frame bit reader: CONSTANT, VERBATIM,
    * FIXED 0–4, or LPC 1–32, with the shared Rice-partition residual
    * machinery. */
  private def decodeSubframe(id: Long, r: BitReader, blockSize: Int,
                             bps: Int): Array[Int] = {
    require(r.readBit() == 0, s"media $id: subframe padding bit set")
    val sfType = r.readBits(6).toInt
    val wasted = r.readBit()
    require(wasted == 0, s"media $id: wasted-bits subframes unsupported")
    val x = new Array[Int](blockSize)

    // Rice-partitioned residuals shared by FIXED and LPC (RFC 9639 §9.2.7)
    def residuals(order: Int)(predict: Int => Int): Unit = {
      val method = r.readBits(2).toInt
      require(method <= 1,
        s"media $id: reserved residual coding method $method")
      val pBits = if (method == 0) 4 else 5
      val escape = (1 << pBits) - 1
      val po = r.readBits(4).toInt
      val nPart = 1 << po
      require(blockSize % nPart == 0 && (blockSize >> po) > order,
        s"media $id: invalid Rice partition order $po for block $blockSize")
      var i = order
      var part = 0
      while (part < nPart) {
        val cnt = (blockSize >> po) - (if (part == 0) order else 0)
        val k = r.readBits(pBits).toInt
        if (k == escape) {
          val raw = r.readBits(5).toInt
          var j = 0
          while (j < cnt) {
            val res = r.readSigned(raw)
            x(i) = res + predict(i); i += 1; j += 1
          }
        } else {
          var j = 0
          while (j < cnt) {
            val q = r.readUnary()
            val lo = r.readBits(k)
            val zz = (q.toLong << k) | lo
            // un-zigzag: even -> zz/2, odd -> -(zz+1)/2
            val res = (if ((zz & 1) == 0) zz >> 1 else -((zz + 1) >> 1)).toInt
            x(i) = res + predict(i); i += 1; j += 1
          }
        }
        part += 1
      }
    }

    sfType match {
      case 0 => // CONSTANT
        val v = r.readSigned(bps)
        java.util.Arrays.fill(x, v)
      case 1 => // VERBATIM
        var i = 0
        while (i < blockSize) { x(i) = r.readSigned(bps); i += 1 }
      case t if t >= 8 && t <= 12 => // FIXED order 0..4
        val order = t - 8
        require(order <= blockSize,
          s"media $id: FIXED order $order exceeds block size $blockSize")
        var i = 0
        while (i < order) { x(i) = r.readSigned(bps); i += 1 }
        residuals(order)(i => predictFixed(order, x, i))
      case t if t >= 32 => // LPC order 1..32 (RFC 9639 §9.2.3)
        val order = (t & 0x1F) + 1
        require(order <= blockSize,
          s"media $id: LPC order $order exceeds block size $blockSize")
        var i = 0
        while (i < order) { x(i) = r.readSigned(bps); i += 1 }
        val precCode = r.readBits(4).toInt
        require(precCode != 15,
          s"media $id: invalid LPC coefficient precision code 15")
        val prec = precCode + 1
        val shift = r.readSigned(5)
        require(shift >= 0, s"media $id: negative LPC shift unsupported")
        val coefs = new Array[Int](order)
        var j = 0
        while (j < order) { coefs(j) = r.readSigned(prec); j += 1 }
        residuals(order) { i =>
          // Long accumulator: |coef| < 2^15, |x| <= 2^17, order <= 32 —
          // the sum stays far inside Long; the arithmetic shift is the
          // spec's quantized-coefficient prediction, exact integers
          var acc = 0L
          var c = 0
          while (c < order) { acc += coefs(c).toLong * x(i - 1 - c); c += 1 }
          (acc >> shift).toInt
        }
      case t =>
        throw new IllegalArgumentException(
          s"media $id: reserved subframe type $t")
    }
    x
  }

  /** Decode a 16-bit FLAC stream to (channels, sampleRate, samples) —
    * samples interleaved L R L R … for stereo, matching the WAV path's
    * stream order so every downstream operator is layout-blind. */
  def decode(id: Long, p: Array[Byte]): (Int, Int, Array[Int]) = {
    require(p.length >= 42 && p(0) == 'f' && p(1) == 'L' && p(2) == 'a' &&
      p(3) == 'C', s"media $id: not a FLAC stream (missing fLaC)")
    def u8(off: Int): Int = { require(off < p.length,
      s"media $id: truncated FLAC at offset $off"); p(off) & 0xFF }
    // metadata block walk: STREAMINFO must come first (spec), others skip
    var off = 4
    var last = false
    var sampleRate = 0
    var nChannels = 0
    var totalSamples = 0L
    var sawStreamInfo = false
    while (!last) {
      val hdr = u8(off)
      last = (hdr & 0x80) != 0
      val typ = hdr & 0x7F
      val len = (u8(off + 1) << 16) | (u8(off + 2) << 8) | u8(off + 3)
      require(off.toLong + 4 + len <= p.length,
        s"media $id: truncated FLAC metadata block type $typ")
      if (typ == 0) {
        require(len == 34, s"media $id: STREAMINFO must be 34 bytes, got $len")
        val d = off + 4
        // 16+16 block sizes, 24+24 frame sizes, then 20 bits rate,
        // 3 bits channels-1, 5 bits bps-1, 36 bits total samples
        sampleRate = (u8(d + 10) << 12) | (u8(d + 11) << 4) | (u8(d + 12) >> 4)
        nChannels = ((u8(d + 12) >> 1) & 0x7) + 1
        val bps = (((u8(d + 12) & 1) << 4) | (u8(d + 13) >> 4)) + 1
        require(nChannels <= 8,
          s"media $id: at most 8 FLAC channels supported (got $nChannels)")
        require(bps == 16,
          s"media $id: only 16-bit FLAC supported (got $bps bps)")
        totalSamples = ((u8(d + 13) & 0xF).toLong << 32) |
          (u8(d + 14).toLong << 24) | (u8(d + 15) << 16) |
          (u8(d + 16) << 8) | u8(d + 17)
        require(totalSamples > 0 &&
          totalSamples * nChannels <= Multimodal.MaxDecodePixels,
          s"media $id: FLAC sample count $totalSamples outside the decode bound")
        sawStreamInfo = true
      }
      off += 4 + len
    }
    require(sawStreamInfo, s"media $id: FLAC stream without STREAMINFO")
    require(sampleRate > 0, s"media $id: bad FLAC sample rate")

    val out = new Array[Int](totalSamples.toInt * nChannels)
    var n = 0
    while (n < out.length) {
      val frameStart = off
      // frame header: 14-bit sync + reserved + blocking strategy
      val sync = (u8(off) << 6) | (u8(off + 1) >> 2)
      require(sync == 0x3FFE, s"media $id: lost FLAC frame sync at $off")
      require((u8(off + 1) & 2) == 0, s"media $id: reserved frame bit set")
      require((u8(off + 1) & 1) == 0,
        s"media $id: only fixed blocking strategy supported")
      val bsCode = u8(off + 2) >> 4
      val srCode = u8(off + 2) & 0xF
      val chan = u8(off + 3) >> 4
      val ssCode = (u8(off + 3) >> 1) & 0x7
      require((u8(off + 3) & 1) == 0, s"media $id: reserved frame bit set")
      // 0..7 = that many + 1 INDEPENDENT channels, 8/9/10 = left-side /
      // right-side / mid-side stereo decorrelation (RFC 9639 §9.1.3)
      require(chan <= 10,
        s"media $id: channel assignment $chan unsupported")
      val frameChannels = if (chan <= 7) chan + 1 else 2
      require(frameChannels == nChannels,
        s"media $id: frame channel assignment $chan disagrees with " +
          s"STREAMINFO's $nChannels channel(s)")
      require(ssCode == 4,
        s"media $id: only 16-bit frames supported (size code $ssCode)")
      require(srCode == 0,
        s"media $id: frame sample-rate code $srCode unsupported " +
          "(STREAMINFO-coded rate only)")
      off += 4
      // coded frame number (UTF-8 style, RFC 9639 §9.1.5)
      val first = u8(off)
      if (first < 0x80) off += 1
      else {
        var ones = 0
        while (ones < 8 && (first & (0x80 >> ones)) != 0) ones += 1
        require(ones >= 2 && ones <= 7,
          s"media $id: malformed coded frame number")
        var i = 1
        while (i < ones) {
          require((u8(off + i) & 0xC0) == 0x80,
            s"media $id: malformed coded frame number continuation")
          i += 1
        }
        off += ones
      }
      val blockSize = bsCode match {
        case 1 => 192
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case 6 => val v = u8(off) + 1; off += 1; v
        case 7 => val v = (u8(off) << 8) + u8(off + 1) + 1; off += 2; v
        case c if c >= 8 => 256 << (c - 8)
        case _ => throw new IllegalArgumentException(
          s"media $id: reserved block-size code")
      }
      require(blockSize > 0 &&
        n.toLong + blockSize.toLong * frameChannels <= out.length,
        s"media $id: FLAC frame overruns declared sample count")
      val hcrc = u8(off)
      require(hcrc == crc8(p, frameStart, off),
        s"media $id: FLAC frame header CRC-8 mismatch")
      off += 1

      // subframes — one per channel, bit-contiguous on a shared reader;
      // the SIDE channel of an 8/9/10 assignment carries one extra bit
      val r = new BitReader(id, p, off)
      val chs = new Array[Array[Int]](frameChannels)
      var ci = 0
      while (ci < frameChannels) {
        val extra = chan match {
          case 8 | 10 => if (ci == 1) 1 else 0
          case 9 => if (ci == 0) 1 else 0
          case _ => 0
        }
        chs(ci) = decodeSubframe(id, r, blockSize, 16 + extra)
        ci += 1
      }
      r.align()
      off = r.bytePos
      val fcrc = (u8(off) << 8) | u8(off + 1)
      require(fcrc == crc16(p, frameStart, off),
        s"media $id: FLAC frame CRC-16 mismatch")
      off += 2
      // reconstruct + interleave (the published decorrelation inverses;
      // mid is stored as (l+r)>>1, recovered via the side's low bit)
      def emit(v: Int): Unit = {
        require(v >= -32768 && v <= 32767,
          s"media $id: decoded FLAC sample $v outside 16-bit range")
        out(n) = v; n += 1
      }
      var i = 0
      while (i < blockSize) {
        chan match {
          case ca if ca <= 7 => // independent channels, interleave in order
            var c2 = 0
            while (c2 < frameChannels) { emit(chs(c2)(i)); c2 += 1 }
          case 8 => emit(chs(0)(i)); emit(chs(0)(i) - chs(1)(i)) // left, left - side
          case 9 => emit(chs(1)(i) + chs(0)(i)); emit(chs(1)(i)) // right + side, right
          case _ => // 10: mid/side
            val m2 = (chs(0)(i) << 1) | (chs(1)(i) & 1)
            emit((m2 + chs(1)(i)) >> 1); emit((m2 - chs(1)(i)) >> 1)
        }
        i += 1
      }
    }
    (nChannels, sampleRate, out)
  }

  // ------------------------------------------------------------------
  // Encoder (fixture side): spec-correct 16-bit mono FLAC output.
  // ------------------------------------------------------------------

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var cur = 0
    private var nbits = 0
    def writeBits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1L).toInt
        nbits += 1
        if (nbits == 8) { out.write(cur); cur = 0; nbits = 0 }
        i -= 1
      }
    }
    def writeUnary(q: Int): Unit = {
      var i = 0
      while (i < q) { writeBits(0, 1); i += 1 }
      writeBits(1, 1)
    }
    def align(): Unit = if (nbits > 0) writeBits(0, 8 - nbits)
  }

  /** Encode 16-bit samples as a real FLAC stream: STREAMINFO, then
    * frames of `blockSize` samples (last frame partial). `channels` = 1
    * takes `samples` as-is; 2 takes them INTERLEAVED L R L R …, with
    * `stereoMode` picking the frame channel assignment (1 independent,
    * 8 left/side, 9 right/side, 10 mid/side — the side subframe carries
    * its spec'd 17th bit). Each non-constant subframe is FIXED with the
    * given `order`, or general LPC when `lpc` supplies (quantized
    * coefficients, shift); constant runs become CONSTANT subframes.
    * Residuals are a single Rice partition whose parameter adapts per
    * subframe. Lossless by construction — [[decode]] (and any conformant
    * decoder) returns the input exactly. */
  def encode(samples: Array[Int], sampleRate: Int = 16000,
             blockSize: Int = 256, order: Int = 2,
             channels: Int = 1, stereoMode: Int = 1,
             lpc: Option[(Array[Int], Int)] = None): Array[Byte] = {
    require(samples.nonEmpty && samples.length <= (1 << 24), "sample count")
    require(blockSize >= 16 && blockSize <= 256, "fixture blockSize <= 256")
    require(order >= 0 && order <= 4, "fixed order 0..4")
    require(channels >= 1 && channels <= 8, "1 to 8 channels")
    require(samples.length % channels == 0,
      "interleaved sample count must divide by the channel count")
    require(channels != 2 || stereoMode == 1 ||
      (stereoMode >= 8 && stereoMode <= 10), s"stereo mode $stereoMode")
    lpc.foreach { case (coefs, shift) =>
      require(coefs.nonEmpty && coefs.length <= 32, "LPC order 1..32")
      require(shift >= 0 && shift <= 15, "LPC shift 0..15")
      coefs.foreach(c => require(c >= -16384 && c <= 16383, s"LPC coef $c"))
    }
    samples.foreach(s => require(s >= -32768 && s <= 32767, s"sample $s"))
    val perChannel = samples.length / channels
    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    // STREAMINFO, marked last metadata block
    val si = new java.io.ByteArrayOutputStream()
    val bw0 = new BitWriter(si)
    bw0.writeBits(blockSize.toLong, 16) // min block size
    bw0.writeBits(blockSize.toLong, 16) // max block size
    bw0.writeBits(0L, 24); bw0.writeBits(0L, 24) // frame sizes unknown
    bw0.writeBits(sampleRate.toLong, 20)
    bw0.writeBits((channels - 1).toLong, 3)
    bw0.writeBits(15L, 5) // bps - 1
    bw0.writeBits(perChannel.toLong, 36)
    var i = 0
    while (i < 16) { si.write(0); i += 1 } // MD5 unset (spec-legal zeros)
    val siB = si.toByteArray
    out.write(0x80); out.write(0); out.write(siB.length >> 8 & 0xFF)
    out.write(siB.length & 0xFF)
    out.write(siB, 0, siB.length)

    // one subframe at `bps` bits: CONSTANT / LPC (when supplied and the
    // frame is long enough) / FIXED, single adaptive Rice partition
    def writeSubframe(bw: BitWriter, x: Array[Int], bps: Int): Unit = {
      val bs = x.length
      val mask = (1L << bps) - 1
      def writeResiduals(ord: Int, predict: Int => Int): Unit = {
        val res = new Array[Long](bs - ord)
        var maxZz = 0L
        var j = ord
        while (j < bs) {
          val e = (x(j) - predict(j)).toLong
          val zz = if (e >= 0) e << 1 else (-e << 1) - 1
          res(j - ord) = zz
          if (zz > maxZz) maxZz = zz
          j += 1
        }
        // smallest k with quotient <= 30 bounds unary length; cap at 14
        var k = 0
        while (k < 14 && (maxZz >> k) > 30) k += 1
        bw.writeBits(0L, 2) // method 0
        bw.writeBits(0L, 4) // partition order 0
        bw.writeBits(k.toLong, 4)
        res.foreach { zz =>
          bw.writeUnary((zz >> k).toInt)
          bw.writeBits(zz & ((1L << k) - 1), k)
        }
      }
      if (x.forall(_ == x(0))) {
        bw.writeBits(0L, 1); bw.writeBits(0L, 6); bw.writeBits(0L, 1)
        bw.writeBits(x(0).toLong & mask, bps)
      } else lpc match {
        case Some((coefs, shift)) if bs > coefs.length =>
          val ord = coefs.length
          bw.writeBits(0L, 1); bw.writeBits((32 + ord - 1).toLong, 6)
          bw.writeBits(0L, 1)
          var j = 0
          while (j < ord) { bw.writeBits(x(j).toLong & mask, bps); j += 1 }
          // coefficient precision: smallest signed width holding them all
          var prec = 2
          while (coefs.exists(c => c < -(1 << (prec - 1)) ||
            c >= (1 << (prec - 1)))) prec += 1
          bw.writeBits((prec - 1).toLong, 4)
          bw.writeBits(shift.toLong, 5)
          coefs.foreach(c => bw.writeBits(c.toLong & ((1L << prec) - 1), prec))
          writeResiduals(ord, { i =>
            var acc = 0L
            var c = 0
            while (c < ord) { acc += coefs(c).toLong * x(i - 1 - c); c += 1 }
            (acc >> shift).toInt
          })
        case _ =>
          val ord = math.min(order, bs - 1)
          bw.writeBits(0L, 1); bw.writeBits((8 + ord).toLong, 6)
          bw.writeBits(0L, 1)
          var j = 0
          while (j < ord) { bw.writeBits(x(j).toLong & mask, bps); j += 1 }
          writeResiduals(ord, i => predictFixed(ord, x, i))
      }
    }

    var n = 0 // per-channel position
    var frameIdx = 0
    while (n < perChannel) {
      val bs = math.min(blockSize, perChannel - n)
      require(frameIdx < 128, "fixture frame count needs 1-byte coded numbers")
      val chanCode =
        if (channels == 1) 0
        else if (channels == 2) stereoMode
        else channels - 1 // 3+ channels: independent
      val frame = new java.io.ByteArrayOutputStream()
      // header: sync(14) 0 blocking(0) | bsCode=6 (8-bit value-1) |
      // srCode=0 | chan | ssCode=4 | 0
      frame.write(0xFF); frame.write(0xF8)
      frame.write((6 << 4) | 0)
      frame.write((chanCode << 4) | (4 << 1) | 0)
      frame.write(frameIdx) // coded number, single byte
      frame.write(bs - 1)
      val head = frame.toByteArray
      frame.write(crc8(head, 0, head.length))
      val bw = new BitWriter(frame)
      if (channels == 1) {
        writeSubframe(bw, java.util.Arrays.copyOfRange(samples, n, n + bs), 16)
      } else if (channels > 2) { // independent surround channels
        var c = 0
        while (c < channels) {
          val x = new Array[Int](bs)
          var j = 0
          while (j < bs) { x(j) = samples(channels * (n + j) + c); j += 1 }
          writeSubframe(bw, x, 16)
          c += 1
        }
      } else {
        val l = new Array[Int](bs)
        val r = new Array[Int](bs)
        var j = 0
        while (j < bs) {
          l(j) = samples(2 * (n + j)); r(j) = samples(2 * (n + j) + 1); j += 1
        }
        stereoMode match {
          case 1 =>
            writeSubframe(bw, l, 16); writeSubframe(bw, r, 16)
          case 8 => // left + side (l - r)
            writeSubframe(bw, l, 16)
            writeSubframe(bw, Array.tabulate(bs)(j => l(j) - r(j)), 17)
          case 9 => // side + right
            writeSubframe(bw, Array.tabulate(bs)(j => l(j) - r(j)), 17)
            writeSubframe(bw, r, 16)
          case _ => // 10: mid ((l + r) >> 1) + side
            writeSubframe(bw, Array.tabulate(bs)(j => (l(j) + r(j)) >> 1), 16)
            writeSubframe(bw, Array.tabulate(bs)(j => l(j) - r(j)), 17)
        }
      }
      bw.align()
      val body = frame.toByteArray
      val c16 = crc16(body, 0, body.length)
      frame.write(c16 >> 8 & 0xFF); frame.write(c16 & 0xFF)
      val fb = frame.toByteArray
      out.write(fb, 0, fb.length)
      n += bs
      frameIdx += 1
    }
    out.toByteArray
  }
}
