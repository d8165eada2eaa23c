package graft.multimodal

import scala.collection.mutable.ArrayBuffer

/** MP4/MOV (ISO BMFF), MP3 (MPEG audio), and Ogg container METADATA
  * walks — deliberately NO codec decode. These are the majority media
  * containers of a real web crawl; the engine's job at 100 TB is to make
  * them MEASURED (format, codec fourcc, geometry, timing, channel
  * layout, all from the published header layouts) instead of lumping
  * them into `unknown_magic`, so the q265-style health census can report
  * `unsupported_codec (avc1)` with evidence rather than blindness.
  *
  * Public layouts implemented from their specs: ISO/IEC 14496-12 box
  * structure (size/type headers, 64-bit largesize, version-split
  * mvhd/tkhd), ISO/IEC 11172-3 / 13818-3 MPEG audio frame headers
  * (version x layer bitrate/sample-rate tables, ID3v2 syncsafe skip),
  * RFC 3533 Ogg paging plus the Vorbis I and RFC 7845 OpusHead
  * identification headers.
  *
  * Same contract as every media walk in this repo (the reference's
  * validator pattern — scripts/validate_dataset.py:1-209 rejects bad
  * rows with a named reason, never by crashing — lifted to bytes):
  * hostile bytes fail by NAME ("media <id>: cause"), every size is
  * checked as UNSIGNED before use, and every loop is bounded (box count,
  * recursion depth, page count) so a crafted length field cannot walk
  * forever. */
private[graft] object ContainerMeta {

  private def fail(id: Long, msg: String): Nothing =
    throw new IllegalArgumentException(s"media $id: $msg")

  private def check(ok: Boolean, id: Long, msg: => String): Unit =
    if (!ok) fail(id, msg)

  private def be(p: Array[Byte], off: Int, len: Int): Long =
    (0 until len).foldLeft(0L)((a, i) => (a << 8) | (p(off + i) & 0xFFL))

  private def le(p: Array[Byte], off: Int, len: Int): Long =
    (0 until len).foldLeft(0L)((a, i) => a | ((p(off + i) & 0xFFL) << (8 * i)))

  private def ascii(p: Array[Byte], off: Int, len: Int): String =
    new String(p, off, len, "US-ASCII")

  // ------------------------------------------------------------------
  // MP4 / MOV — ISO base media file format box walk
  // ------------------------------------------------------------------

  /** One media track: handler ("vide"/"soun"/...), sample-entry codec
    * fourcc from stsd, display dims from tkhd (16.16 fixed, video only),
    * audio channel count + sample rate from the stsd AudioSampleEntry. */
  final case class TrackMeta(handler: String, codec: String,
                             width: Int, height: Int,
                             channels: Int, sampleRate: Int)

  /** File-level metadata: ftyp major brand, mvhd duration in ms, and one
    * entry per trak in file order. */
  final case class Mp4Meta(brand: String, durationMs: Long,
                           tracks: Seq[TrackMeta])

  /** ISO BMFF magic: every file leads with an ftyp box ("moov"-first
    * legacy QuickTime is accepted too — the walk only needs box syntax,
    * but detection keys on the two real-world leads). */
  def isMp4(p: Array[Byte]): Boolean =
    p.length >= 12 && (ascii(p, 4, 4) == "ftyp" || ascii(p, 4, 4) == "moov")

  private val Mp4MaxBoxes = 512
  private val Mp4MaxDepth = 8

  /** Box walk → [[Mp4Meta]]. Descends only into the containers on the
    * moov→trak→mdia→minf→stbl spine; leaf boxes it reads are ftyp, mvhd
    * (version 0 and 1), tkhd (both versions; dims are 16.16 fixed),
    * hdlr, and stsd's first sample entry (video dims at the published
    * VisualSampleEntry offsets, audio channels/rate at the
    * AudioSampleEntry ones). Everything else is skipped whole by its
    * declared size — metadata never touches mdat. */
  def mp4Meta(id: Long, p: Array[Byte]): Mp4Meta = {
    check(isMp4(p), id, "not an ISO BMFF (MP4/MOV) container")
    var brand = ""
    var timescale = 0L
    var duration = -1L
    val tracks = ArrayBuffer.empty[TrackMeta]
    // per-trak accumulation: tkhd/hdlr/stsd arrive as siblings at
    // different depths, so the walk keeps the "current track" open until
    // its trak box closes (closure = the recursive call returning)
    var curHandler = ""; var curCodec = ""
    var curW = 0; var curH = 0; var curCh = 0; var curSr = 0
    var boxes = 0

    def walk(start: Long, end: Long, depth: Int): Unit = {
      check(depth <= Mp4MaxDepth, id, "MP4 box nesting exceeds depth 8")
      var off = start
      while (off + 8 <= end) {
        boxes += 1
        check(boxes <= Mp4MaxBoxes, id, s"MP4 box walk exceeded $Mp4MaxBoxes boxes")
        val size32 = be(p, off.toInt, 4) // unsigned
        val typ = ascii(p, off.toInt + 4, 4)
        val (size, hdr) =
          if (size32 == 1L) {
            check(off + 16 <= end, id, s"truncated largesize $typ box")
            (be(p, off.toInt + 8, 8), 16L)
          } else if (size32 == 0L) (end - off, 8L) // box extends to end
          else (size32, 8L)
        check(size >= hdr, id, s"MP4 $typ box size $size smaller than its header")
        check(off + size <= end, id, s"truncated MP4 $typ box")
        val body = off + hdr
        val bodyLen = size - hdr
        typ match {
          case "ftyp" =>
            check(bodyLen >= 4, id, "ftyp box too short for a major brand")
            brand = ascii(p, body.toInt, 4)
          case "moov" | "mdia" | "minf" | "stbl" =>
            walk(body, off + size, depth + 1)
          case "trak" =>
            curHandler = ""; curCodec = ""; curW = 0; curH = 0
            curCh = 0; curSr = 0
            walk(body, off + size, depth + 1)
            tracks += TrackMeta(curHandler, curCodec, curW, curH, curCh, curSr)
          case "mvhd" =>
            check(bodyLen >= 4, id, "mvhd box too short")
            val v = p(body.toInt) & 0xFF
            if (v == 1) {
              check(bodyLen >= 32, id, "truncated version-1 mvhd")
              timescale = be(p, body.toInt + 20, 4)
              duration = be(p, body.toInt + 24, 8)
            } else {
              check(bodyLen >= 24, id, "truncated version-0 mvhd")
              timescale = be(p, body.toInt + 12, 4)
              duration = be(p, body.toInt + 16, 4)
            }
            check(timescale > 0, id, "mvhd timescale must be positive")
          case "tkhd" =>
            check(bodyLen >= 4, id, "tkhd box too short")
            val v = p(body.toInt) & 0xFF
            val dimsOff = if (v == 1) 88L else 76L // after the matrix
            if (bodyLen >= dimsOff + 8) {
              curW = (be(p, (body + dimsOff).toInt, 4) >> 16).toInt
              curH = (be(p, (body + dimsOff + 4).toInt, 4) >> 16).toInt
            }
          case "hdlr" =>
            check(bodyLen >= 12, id, "hdlr box too short")
            curHandler = ascii(p, body.toInt + 8, 4)
          case "stsd" =>
            check(bodyLen >= 16, id, "stsd box too short for a sample entry")
            val entrySize = be(p, body.toInt + 8, 4)
            check(entrySize >= 8 && 8 + entrySize <= bodyLen, id,
              "stsd sample entry overruns its box")
            curCodec = ascii(p, body.toInt + 12, 4)
            val e = body + 8 // first sample entry
            if (curHandler == "vide" && entrySize >= 36) {
              // VisualSampleEntry: dims also live here (u16 at +32/+34)
              if (curW == 0) curW = be(p, (e + 32).toInt, 2).toInt
              if (curH == 0) curH = be(p, (e + 34).toInt, 2).toInt
            } else if (curHandler == "soun" && entrySize >= 36) {
              // AudioSampleEntry: channelcount u16 at +24, samplerate
              // 16.16 fixed at +32
              curCh = be(p, (e + 24).toInt, 2).toInt
              curSr = (be(p, (e + 32).toInt, 4) >> 16).toInt
            }
          case _ => () // mdat, free, udta, iods, edts, …: skip whole
        }
        off += size
      }
      check(off == end, id, "MP4 box sizes do not tile their container")
    }

    walk(0L, p.length.toLong, 0)
    check(duration >= 0, id, "MP4 container without an mvhd header")
    // be() reads up to 2^63-1 from a version-1 mvhd: bound BEFORE the
    // ms conversion so a hostile duration fails by name, not by silent
    // Long overflow into a negative durationMs
    check(duration <= Long.MaxValue / 1000L, id,
      s"mvhd duration $duration overflows the millisecond conversion")
    Mp4Meta(brand, duration * 1000L / timescale, tracks.toSeq)
  }

  // ------------------------------------------------------------------
  // MP3 — MPEG-1/2/2.5 audio frame header (+ ID3v2 skip)
  // ------------------------------------------------------------------

  final case class Mp3Meta(version: String, layer: Int, bitrateKbps: Int,
                           sampleRate: Int, channels: Int)

  private def hasMp3Sync(p: Array[Byte], off: Int): Boolean =
    off + 4 <= p.length && (p(off) & 0xFF) == 0xFF && (p(off + 1) & 0xE0) == 0xE0

  /** MP3 magic: an ID3v2 tag or an MPEG audio frame sync at offset 0.
    * The sync test also requires valid version/layer bits so random
    * 0xFFFx bytes don't claim the format. */
  def isMp3(p: Array[Byte]): Boolean =
    (p.length >= 10 && ascii(p, 0, 3) == "ID3") ||
      (hasMp3Sync(p, 0) && ((p(1) >> 3) & 3) != 1 && ((p(1) >> 1) & 3) != 0)

  // bitrate tables, kbps, index 1-14 (0 = free format, 15 = invalid):
  // MPEG-1 layers I/II/III and MPEG-2/2.5 layers I and II+III
  private val BitrateV1L1 = Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
  private val BitrateV1L2 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
  private val BitrateV1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val BitrateV2L1 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)
  private val BitrateV2L23 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

  /** Parse the first MPEG audio frame header, hopping a leading ID3v2
    * tag by its syncsafe size (and footer flag). Returns the published
    * header fields; free-format (bitrate index 0) reports 0 kbps. */
  def mp3Meta(id: Long, p: Array[Byte]): Mp3Meta = {
    var off = 0
    if (p.length >= 10 && ascii(p, 0, 3) == "ID3") {
      // syncsafe u28: four 7-bit bytes, high bits must be clear
      check((p(6) | p(7) | p(8) | p(9)) >= 0, id, "ID3v2 size is not syncsafe")
      val tagSize = ((p(6) & 0x7FL) << 21) | ((p(7) & 0x7FL) << 14) |
        ((p(8) & 0x7FL) << 7) | (p(9) & 0x7FL)
      val footer = if ((p(5) & 0x10) != 0) 10L else 0L
      val next = 10L + tagSize + footer
      check(next + 4 <= p.length, id, "ID3v2 tag truncates the MPEG stream")
      off = next.toInt
    }
    check(hasMp3Sync(p, off), id, "no MPEG audio frame sync")
    val b1 = p(off + 1) & 0xFF; val b2 = p(off + 2) & 0xFF
    val b3 = p(off + 3) & 0xFF
    val verBits = (b1 >> 3) & 3
    check(verBits != 1, id, "reserved MPEG version bits")
    val version = verBits match {
      case 3 => "mpeg1"; case 2 => "mpeg2"; case _ => "mpeg2.5"
    }
    val layerBits = (b1 >> 1) & 3
    check(layerBits != 0, id, "reserved MPEG layer bits")
    val layer = 4 - layerBits // 3->I(1), 2->II(2), 1->III(3)
    val brIdx = (b2 >> 4) & 0xF
    check(brIdx != 15, id, "invalid MPEG bitrate index 15")
    val bitrate = ((verBits == 3, layer) match {
      case (true, 1) => BitrateV1L1
      case (true, 2) => BitrateV1L2
      case (true, _) => BitrateV1L3
      case (false, 1) => BitrateV2L1
      case (false, _) => BitrateV2L23
    })(brIdx)
    val srIdx = (b2 >> 2) & 3
    check(srIdx != 3, id, "reserved MPEG sample-rate index")
    val sampleRate = verBits match {
      case 3 => Array(44100, 48000, 32000)(srIdx)
      case 2 => Array(22050, 24000, 16000)(srIdx)
      case _ => Array(11025, 12000, 8000)(srIdx)
    }
    val channels = if (((b3 >> 6) & 3) == 3) 1 else 2
    Mp3Meta(version, layer, bitrate, sampleRate, channels)
  }

  // ------------------------------------------------------------------
  // ID3v2 text frames — the curation-relevant audio metadata
  // ------------------------------------------------------------------

  /** Reverse ID3v2 unsynchronisation over [from, until): every 0xFF 0x00
    * pair collapses back to the original 0xFF. */
  private def deUnsync(b: Array[Byte], from: Int, until: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(until - from)
    var i = from
    while (i < until) {
      out.write(b(i))
      if ((b(i) & 0xFF) == 0xFF && i + 1 < until && b(i + 1) == 0) i += 2
      else i += 1
    }
    out.toByteArray
  }

  /** Text frames (TIT2 title, TPE1 artist, TALB album, …) from a
    * leading ID3v2.3/2.4 tag, in frame order. Curation pipelines filter
    * and label audio on exactly these. Frame sizes are big-endian plain
    * in v2.3 and syncsafe in v2.4 (the version byte decides); all four
    * declared text encodings decode (latin-1, UTF-16 with BOM,
    * UTF-16BE, UTF-8), trailing NULs stripped. The header FLAG byte is
    * honored: an extended header (0x40) is skipped by its declared size
    * (syncsafe and self-inclusive in v2.4, plain and size-field-exclusive
    * in v2.3), tag-level unsynchronisation (0x80 — a v2.3 whole-tag
    * scheme; v2.4's tag flag merely announces per-frame flags) is
    * reversed over the tag body before the walk, and a v2.4 frame whose
    * unsync format flag (0x02) is set gets its body reversed before text
    * decode. Non-text frames are skipped by size; compressed/encrypted
    * text frames and hostile sizes fail by name; a payload with no ID3v2
    * tag returns empty (absence is data, not an error). */
  def id3TextFrames(id: Long, p: Array[Byte]): Seq[(String, String)] = {
    if (p.length < 10 || ascii(p, 0, 3) != "ID3") return Seq.empty
    val version = p(3) & 0xFF
    check(version == 3 || version == 4, id,
      s"unsupported ID3v2.$version tag")
    check((p(6) | p(7) | p(8) | p(9)) >= 0, id, "ID3v2 size is not syncsafe")
    val tagSize = ((p(6) & 0x7FL) << 21) | ((p(7) & 0x7FL) << 14) |
      ((p(8) & 0x7FL) << 7) | (p(9) & 0x7FL)
    check(10L + tagSize <= p.length, id, "ID3v2 tag truncates the payload")
    val flags = p(5) & 0xFF
    // v2.3 applies unsynchronisation to the WHOLE tag as the last encode
    // step (frame sizes refer to the de-unsynced layout); v2.4 moved the
    // scheme per-frame, so its tag-level flag is only an announcement
    val tag =
      if (version == 3 && (flags & 0x80) != 0)
        deUnsync(p, 10, (10L + tagSize).toInt)
      else java.util.Arrays.copyOfRange(p, 10, (10L + tagSize).toInt)
    val end = tag.length.toLong
    var off = 0L
    if ((flags & 0x40) != 0) { // extended header precedes the first frame
      if (version == 4) {
        check(end >= 6, id, "truncated ID3v2.4 extended header")
        check((tag(0) | tag(1) | tag(2) | tag(3)) >= 0, id,
          "ID3v2.4 extended header size not syncsafe")
        val ext = ((tag(0) & 0x7FL) << 21) | ((tag(1) & 0x7FL) << 14) |
          ((tag(2) & 0x7FL) << 7) | (tag(3) & 0x7FL)
        check(ext >= 6 && ext <= end, id,
          s"ID3v2.4 extended header size $ext out of range")
        off = ext // v2.4 size INCLUDES the size field itself
      } else {
        check(end >= 4, id, "truncated ID3v2.3 extended header")
        val ext = be(tag, 0, 4) // v2.3 size EXCLUDES the size field
        check(4 + ext <= end, id,
          s"ID3v2.3 extended header size $ext overruns the tag")
        off = 4 + ext
      }
    }
    val out = ArrayBuffer.empty[(String, String)]
    var frames = 0
    while (off + 10 <= end) {
      // zero padding after the last frame is legal — stop at a NUL id
      if (tag(off.toInt) == 0) return out.toSeq
      frames += 1
      check(frames <= 256, id, "ID3v2 frame walk exceeded 256 frames")
      val fid = ascii(tag, off.toInt, 4)
      check(fid.forall(c => (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')),
        id, s"invalid ID3v2 frame id at offset $off")
      val size =
        if (version == 4) {
          check((tag(off.toInt + 4) | tag(off.toInt + 5) | tag(off.toInt + 6) |
            tag(off.toInt + 7)) >= 0, id, s"ID3v2.4 frame $fid size not syncsafe")
          ((tag(off.toInt + 4) & 0x7FL) << 21) | ((tag(off.toInt + 5) & 0x7FL) << 14) |
            ((tag(off.toInt + 6) & 0x7FL) << 7) | (tag(off.toInt + 7) & 0x7FL)
        } else be(tag, off.toInt + 4, 4)
      check(off + 10 + size <= end, id, s"truncated ID3v2 frame $fid")
      if (fid.startsWith("T") && size >= 1) {
        val fmtFlags = tag(off.toInt + 9) & 0xFF
        val compressed =
          if (version == 4) (fmtFlags & 0x08) != 0 else (fmtFlags & 0x80) != 0
        val encrypted =
          if (version == 4) (fmtFlags & 0x04) != 0 else (fmtFlags & 0x40) != 0
        check(!compressed && !encrypted, id,
          s"compressed/encrypted ID3v2 text frame $fid")
        val fstart = off.toInt + 10
        val fbody: Array[Byte] =
          if (version == 4 && (fmtFlags & 0x02) != 0)
            deUnsync(tag, fstart, fstart + size.toInt)
          else java.util.Arrays.copyOfRange(tag, fstart, fstart + size.toInt)
        val enc = fbody(0) & 0xFF
        check(enc <= 3, id, s"unknown ID3v2 text encoding $enc in $fid")
        val charset = enc match {
          case 0 => "ISO-8859-1"
          case 1 => "UTF-16" // BOM-led
          case 2 => "UTF-16BE"
          case _ => "UTF-8"
        }
        val text = new String(fbody, 1, fbody.length - 1, charset)
        out += fid -> text.replaceAll("\u0000+$", "")
      }
      off += 10 + size
    }
    out.toSeq
  }

  /** Apply ID3v2 unsynchronisation: insert 0x00 after every 0xFF. */
  private def applyUnsync(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(b.length + 8)
    b.foreach { v => out.write(v); if ((v & 0xFF) == 0xFF) out.write(0) }
    out.toByteArray
  }

  private def syncsafeBytes(n: Int): Array[Byte] =
    Array[Byte](((n >> 21) & 0x7F).toByte, ((n >> 14) & 0x7F).toByte,
      ((n >> 7) & 0x7F).toByte, (n & 0x7F).toByte)

  /** Fixture side: an ID3v2.3 or 2.4 tag over the given text frames
    * (encoding cycles per frame: latin-1 / UTF-16+BOM / UTF-16BE /
    * UTF-8), followed by a real MPEG frame so the result is a playable
    * MP3 layout. `extHeader` plants the version's extended-header layout
    * (v2.4 self-inclusive syncsafe size; v2.3 size-field-exclusive
    * plain size); `unsync` plants the version's unsynchronisation
    * scheme (v2.3 whole-tag; v2.4 per-frame format flag 0x02 — note the
    * UTF-16 encodings emit 0xFF bytes, so the scheme is really
    * exercised). */
  def mp3StubTagged(frames: Seq[(String, String)], v4: Boolean,
                    padding: Int = 0, extHeader: Boolean = false,
                    unsync: Boolean = false): Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream()
    if (extHeader) {
      if (v4) { // syncsafe size INCLUDING itself, 1 flag byte, no data
        body.write(syncsafeBytes(6), 0, 4); body.write(1); body.write(0)
      } else { // plain size EXCLUDING the field: 2 flag bytes + 4 padding
        body.write(beBytes(6, 4), 0, 4)
        body.write(0); body.write(0)
        body.write(beBytes(0, 4), 0, 4)
      }
    }
    frames.zipWithIndex.foreach { case ((fid, text), i) =>
      require(fid.length == 4, s"frame id $fid")
      val enc = i % 4
      val charset = enc match {
        case 0 => "ISO-8859-1"
        case 1 => "UTF-16" // writes a BOM
        case 2 => "UTF-16BE"
        case _ => "UTF-8"
      }
      val raw = Array(enc.toByte) ++ text.getBytes(charset)
      // v2.4 unsynchronisation is per-frame: the stored size counts the
      // unsynced bytes and format flag 0x02 marks the frame
      val frameUnsync = v4 && unsync
      val payload = if (frameUnsync) applyUnsync(raw) else raw
      body.write(fid.getBytes("US-ASCII"))
      val n = payload.length
      if (v4) body.write(syncsafeBytes(n), 0, 4)
      else body.write(beBytes(n, 4), 0, 4)
      body.write(0); body.write(if (frameUnsync) 2 else 0) // frame flags
      body.write(payload, 0, payload.length)
    }
    (0 until padding).foreach(_ => body.write(0))
    // v2.3 unsynchronisation is the LAST whole-tag encode step; the tag
    // size in the header counts the unsynced bytes
    val tag =
      if (!v4 && unsync) applyUnsync(body.toByteArray) else body.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write("ID3".getBytes("US-ASCII"))
    out.write(if (v4) 4 else 3); out.write(0)
    out.write((if (unsync) 0x80 else 0) | (if (extHeader) 0x40 else 0))
    out.write(syncsafeBytes(tag.length), 0, 4)
    out.write(tag, 0, tag.length)
    // a real MPEG1 Layer III 128 kbps 44100 Hz stereo frame header
    out.write(Array[Byte](0xFF.toByte, 0xFB.toByte, 0x90.toByte, 0x00))
    (0 until 96).foreach(i => out.write((i * 17 + 3) & 0xFF))
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // Ogg — RFC 3533 page walk + Vorbis/Opus identification headers
  // ------------------------------------------------------------------

  final case class OggMeta(codec: String, channels: Int, sampleRate: Int,
                           nPages: Int)

  def isOgg(p: Array[Byte]): Boolean =
    p.length >= 28 && ascii(p, 0, 4) == "OggS"

  private val OggMaxPages = 4096

  /** Walk every page (bounded), verify the fixed header layout, and read
    * the codec identification from the first packet of the first page:
    * Vorbis I ("\\x01vorbis": channels u8, rate LE u32) or OpusHead
    * (channels u8, input rate LE u32). Unknown first packets are a NAMED
    * failure carrying the leading bytes as evidence. */
  def oggMeta(id: Long, p: Array[Byte]): OggMeta = {
    check(isOgg(p), id, "not an Ogg container")
    var codec = ""; var channels = 0; var rate = 0
    var off = 0L
    var pages = 0
    while (off + 27 <= p.length) {
      pages += 1
      check(pages <= OggMaxPages, id, s"Ogg page walk exceeded $OggMaxPages pages")
      check(ascii(p, off.toInt, 4) == "OggS", id,
        s"Ogg page $pages lost capture sync")
      check((p(off.toInt + 4) & 0xFF) == 0, id, "unsupported Ogg version")
      val nsegs = p(off.toInt + 26) & 0xFF
      check(off + 27 + nsegs <= p.length, id, "truncated Ogg segment table")
      var bodyLen = 0L
      var s = 0
      while (s < nsegs) { bodyLen += (p(off.toInt + 27 + s) & 0xFF); s += 1 }
      val body = off + 27 + nsegs
      check(body + bodyLen <= p.length, id, "truncated Ogg page body")
      if (pages == 1) {
        check(nsegs >= 1 && bodyLen >= 8, id,
          "first Ogg page has no identification packet")
        val b = body.toInt
        if ((p(b) & 0xFF) == 1 && ascii(p, b + 1, 6) == "vorbis") {
          check(bodyLen >= 30, id, "truncated Vorbis identification header")
          check(le(p, b + 7, 4) == 0L, id, "unsupported Vorbis version")
          codec = "vorbis"
          channels = p(b + 11) & 0xFF
          rate = le(p, b + 12, 4).toInt
        } else if (ascii(p, b, 8) == "OpusHead") {
          check(bodyLen >= 19, id, "truncated OpusHead")
          codec = "opus"
          channels = p(b + 9) & 0xFF
          rate = le(p, b + 12, 4).toInt
        } else fail(id, "unrecognized Ogg codec identification packet " +
          s"(leads 0x${(p(b) & 0xFF).toHexString})")
      }
      off = body + bodyLen
    }
    check(off == p.length, id, "Ogg page sizes do not tile the payload")
    OggMeta(codec, channels, rate, pages)
  }

  /** The comment header — packet 2 of a Vorbis or Opus stream — as
    * (FIELD, value) pairs in comment order, FIELD uppercased (the spec
    * makes field names case-insensitive). Both codecs carry the same
    * Vorbis-comment block (vendor length+string, comment count, then
    * length-prefixed "FIELD=value" UTF-8 strings) behind their own
    * packet magic (0x03"vorbis" / "OpusTags"). Packets are reassembled
    * across pages by the RFC 3533 lacing rules (255 continues, <255
    * ends; the continuation flag spans pages), every length is checked
    * before use, and the comment count is bounded — hostile counts and
    * overruns fail by NAME. */
  def oggTextComments(id: Long, p: Array[Byte]): Seq[(String, String)] = {
    check(isOgg(p), id, "not an Ogg container")
    val MaxCommentPacket = 1 << 20
    var off = 0L
    var pages = 0
    var packetsDone = 0
    val buf = new java.io.ByteArrayOutputStream()
    while (off + 27 <= p.length && packetsDone < 2) {
      pages += 1
      check(pages <= OggMaxPages, id, s"Ogg page walk exceeded $OggMaxPages pages")
      check(ascii(p, off.toInt, 4) == "OggS", id,
        s"Ogg page $pages lost capture sync")
      check((p(off.toInt + 4) & 0xFF) == 0, id, "unsupported Ogg version")
      val nsegs = p(off.toInt + 26) & 0xFF
      check(off + 27 + nsegs <= p.length, id, "truncated Ogg segment table")
      var segOff = off + 27 + nsegs
      var s = 0
      while (s < nsegs && packetsDone < 2) {
        val lace = p(off.toInt + 27 + s) & 0xFF
        check(segOff + lace <= p.length, id, "truncated Ogg page body")
        if (packetsDone == 1) { // the comment header is packet 2
          buf.write(p, segOff.toInt, lace)
          check(buf.size <= MaxCommentPacket, id,
            "Ogg comment packet exceeds the 1 MiB bound")
        }
        if (lace < 255) packetsDone += 1
        segOff += lace
        s += 1
      }
      // skip any remaining segments of this page wholesale
      while (s < nsegs) {
        segOff += (p(off.toInt + 27 + s) & 0xFF); s += 1
      }
      check(segOff <= p.length, id, "truncated Ogg page body")
      off = segOff
    }
    check(packetsDone >= 2, id, "Ogg stream ends before a comment header")
    parseVorbisCommentBlock(id, buf.toByteArray)
  }

  /** The Vorbis-comment block behind its packet magic. */
  private def parseVorbisCommentBlock(id: Long,
                                      pkt: Array[Byte]): Seq[(String, String)] = {
    var off =
      if (pkt.length >= 7 && (pkt(0) & 0xFF) == 3 &&
        ascii(pkt, 1, 6) == "vorbis") 7
      else if (pkt.length >= 8 && ascii(pkt, 0, 8) == "OpusTags") 8
      else fail(id, "unrecognized Ogg comment header packet")
    check(off + 4 <= pkt.length, id, "truncated Ogg comment vendor length")
    val vlen = le(pkt, off, 4); off += 4
    check(off + vlen <= pkt.length, id, "Ogg comment vendor string overruns")
    off += vlen.toInt
    check(off + 4 <= pkt.length, id, "truncated Ogg comment count")
    val count = le(pkt, off, 4); off += 4
    check(count <= 1024, id, s"Ogg comment count $count exceeds 1024")
    val out = ArrayBuffer.empty[(String, String)]
    var i = 0L
    while (i < count) {
      check(off + 4 <= pkt.length, id, s"truncated Ogg comment length ${i + 1}")
      val clen = le(pkt, off, 4); off += 4
      check(off + clen <= pkt.length, id, s"Ogg comment ${i + 1} overruns")
      val s = new String(pkt, off, clen.toInt, "UTF-8"); off += clen.toInt
      val eq = s.indexOf('=')
      check(eq > 0, id, s"Ogg comment ${i + 1} without a FIELD=value '='")
      out += s.substring(0, eq).toUpperCase(java.util.Locale.ROOT) ->
        s.substring(eq + 1)
      i += 1
    }
    out.toSeq
  }

  // ------------------------------------------------------------------
  // MP4 ilst text tags + HEIF (HEIC/AVIF) brand evidence
  // ------------------------------------------------------------------

  /** iTunes-style metadata fourccs (0xA9 = ©) → curation field names. */
  private val IlstFields: Map[Long, String] = Map(
    0xA96E616DL -> "title",   // ©nam
    0xA9415254L -> "artist",  // ©ART
    0xA9616C62L -> "album",   // ©alb
    0xA9646179L -> "date",    // ©day
    0xA967656EL -> "genre")   // ©gen

  /** Text tags from the moov→udta→meta→ilst atom spine — the MP4 twin
    * of ID3v2 text frames. Each ilst child holding a UTF-8 `data` atom
    * (type indicator 1) with a well-known fourcc (©nam/©ART/©alb/
    * ©day/©gen) yields a normalized (field, value) row; other children
    * are skipped whole by size. `meta` is a FULLBOX (4 version/flags
    * bytes precede its children — the classic off-by-4 in naive
    * walkers). Same bounds and named failures as [[mp4Meta]]; a
    * container without an ilst returns empty (absence is data). */
  def mp4TextTags(id: Long, p: Array[Byte]): Seq[(String, String)] = {
    check(isMp4(p), id, "not an ISO BMFF (MP4/MOV) container")
    val out = ArrayBuffer.empty[(String, String)]
    var boxes = 0
    // spine: "" → moov → udta → meta → ilst; inside ilst each child is
    // a tag atom whose children include the `data` payload atom
    def walk(start: Long, end: Long, depth: Int, inIlst: Boolean): Unit = {
      check(depth <= Mp4MaxDepth, id, "MP4 box nesting exceeds depth 8")
      var off = start
      while (off + 8 <= end) {
        boxes += 1
        check(boxes <= Mp4MaxBoxes, id, s"MP4 box walk exceeded $Mp4MaxBoxes boxes")
        val size32 = be(p, off.toInt, 4)
        val (size, hdr) =
          if (size32 == 1L) {
            check(off + 16 <= end, id, "truncated largesize box")
            (be(p, off.toInt + 8, 8), 16L)
          } else if (size32 == 0L) (end - off, 8L)
          else (size32, 8L)
        check(size >= hdr, id, s"MP4 box size $size smaller than its header")
        check(off + size <= end, id, "truncated MP4 box")
        val typ4 = be(p, off.toInt + 4, 4)
        val typ = ascii(p, off.toInt + 4, 4)
        val body = off + hdr
        if (inIlst) {
          IlstFields.get(typ4).foreach { field =>
            // the tag atom's first child should be `data`:
            // size u32 | 'data' | 1-byte version + 3-byte type | locale
            if (size - hdr >= 16 && ascii(p, (body + 4).toInt, 4) == "data") {
              val dataSize = be(p, body.toInt, 4)
              check(dataSize >= 16 && dataSize <= size - hdr, id,
                s"ilst $field data atom overruns its tag")
              val typeInd = be(p, (body + 8).toInt, 4) & 0xFFFFFFL
              if (typeInd == 1L) { // 1 = UTF-8 text
                val vLen = (dataSize - 16).toInt
                out += field -> new String(p, (body + 16).toInt, vLen, "UTF-8")
              }
            }
          }
        } else typ match {
          case "moov" | "udta" | "ilst" =>
            walk(body, off + size, depth + 1, typ == "ilst")
          case "meta" => // FullBox: children start after version/flags
            check(size - hdr >= 4, id, "meta box too short for version/flags")
            walk(body + 4, off + size, depth + 1, inIlst = false)
          case _ => ()
        }
        off += size
      }
      check(off == end, id, "MP4 box sizes do not tile their container")
    }
    walk(0L, p.length.toLong, 0, inIlst = false)
    out.toSeq
  }

  /** The ftyp major brand, or "" when the payload does not lead with an
    * ftyp box (legacy moov-first QuickTime has no brand). */
  def ftypBrand(p: Array[Byte]): String =
    if (p.length >= 12 && ascii(p, 4, 4) == "ftyp") ascii(p, 8, 4) else ""

  /** HEIF still-image brands riding the ISO BMFF container: without
    * this, routing telemetry calls still images "video containers".
    * heic/heix (HEVC-coded) → "heic"; avif/avis (AV1-coded) → "avif". */
  def heifFormat(p: Array[Byte]): Option[String] = ftypBrand(p) match {
    case "heic" | "heix" => Some("heic")
    case "avif" | "avis" => Some("avif")
    case _ => None
  }

  /** Display dims of a HEIF image from the meta→iprp→ipco→ispe spine
    * (ispe is a FullBox: version/flags, then width u32, height u32).
    * HEIF stores stills under `meta`, not `moov` — the mvhd-based walk
    * never sees them. Returns the FIRST ispe (the primary item's in
    * every real encoder layout); None when absent. */
  def heifDims(id: Long, p: Array[Byte]): Option[(Int, Int)] = {
    check(isMp4(p), id, "not an ISO BMFF container")
    var dims: Option[(Int, Int)] = None
    var boxes = 0
    def walk(start: Long, end: Long, depth: Int): Unit = {
      check(depth <= Mp4MaxDepth, id, "MP4 box nesting exceeds depth 8")
      var off = start
      while (off + 8 <= end && dims.isEmpty) {
        boxes += 1
        check(boxes <= Mp4MaxBoxes, id, s"MP4 box walk exceeded $Mp4MaxBoxes boxes")
        val size32 = be(p, off.toInt, 4)
        val (size, hdr) =
          if (size32 == 1L) {
            check(off + 16 <= end, id, "truncated largesize box")
            (be(p, off.toInt + 8, 8), 16L)
          } else if (size32 == 0L) (end - off, 8L)
          else (size32, 8L)
        check(size >= hdr, id, s"MP4 box size $size smaller than its header")
        check(off + size <= end, id, "truncated MP4 box")
        val typ = ascii(p, off.toInt + 4, 4)
        val body = off + hdr
        typ match {
          case "iprp" | "ipco" => walk(body, off + size, depth + 1)
          case "meta" =>
            check(size - hdr >= 4, id, "meta box too short for version/flags")
            walk(body + 4, off + size, depth + 1)
          case "ispe" =>
            check(size - hdr >= 12, id, "truncated ispe box")
            dims = Some((be(p, (body + 4).toInt, 4).toInt,
              be(p, (body + 8).toInt, 4).toInt))
          case _ => ()
        }
        off += size
      }
    }
    walk(0L, p.length.toLong, 0)
    dims
  }

  // ------------------------------------------------------------------
  // fixture encoders — real byte layouts for oracle rows and fuzz seeds
  // ------------------------------------------------------------------

  private def beBytes(v: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((v >> (8 * (n - 1 - i))) & 0xFF).toByte)

  private def leBytes(v: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((v >> (8 * i)) & 0xFF).toByte)

  private def box(typ: String, body: Array[Byte]): Array[Byte] =
    beBytes(8L + body.length, 4) ++ typ.getBytes("US-ASCII") ++ body

  /** A spec-layout MP4: ftyp + moov(mvhd + one trak per spec [+ udta/
    * meta/ilst text tags]) + a stub mdat. Video tracks carry tkhd dims
    * (16.16) and a VisualSampleEntry; audio tracks carry an
    * AudioSampleEntry with channels + 16.16 rate; `tags` plants
    * iTunes-style UTF-8 `data` atoms under the normalized field names
    * [[IlstFields]] knows. */
  def mp4Stub(brand: String, timescale: Int, duration: Long,
              tracks: Seq[TrackMeta],
              tags: Seq[(String, String)] = Seq.empty): Array[Byte] = {
    val ftyp = box("ftyp", brand.getBytes("US-ASCII") ++ beBytes(0, 4) ++
      "isom".getBytes("US-ASCII"))
    val mvhd = box("mvhd", beBytes(0, 4) ++ beBytes(0, 4) ++ beBytes(0, 4) ++
      beBytes(timescale, 4) ++ beBytes(duration, 4) ++
      new Array[Byte](80)) // rate/volume/matrix/predefined/next-track
    val traks = tracks.map { t =>
      val isVideo = t.handler == "vide"
      val tkhd = box("tkhd", beBytes(0, 4) ++ new Array[Byte](72) ++
        beBytes(t.width.toLong << 16, 4) ++ beBytes(t.height.toLong << 16, 4))
      val hdlr = box("hdlr", beBytes(0, 4) ++ beBytes(0, 4) ++
        t.handler.getBytes("US-ASCII") ++ new Array[Byte](13))
      val entryBody: Array[Byte] =
        if (isVideo)
          new Array[Byte](24) ++ beBytes(t.width, 2) ++ beBytes(t.height, 2) ++
            new Array[Byte](50) // resolution..depth + predefined
        else
          new Array[Byte](16) ++ beBytes(t.channels, 2) ++ beBytes(16, 2) ++
            new Array[Byte](4) ++ beBytes(t.sampleRate.toLong << 16, 4)
      val entry = beBytes(8L + entryBody.length, 4) ++
        t.codec.getBytes("US-ASCII") ++ entryBody
      val stsd = box("stsd", beBytes(0, 4) ++ beBytes(1, 4) ++ entry)
      val stbl = box("stbl", stsd)
      val minf = box("minf", stbl)
      val mdia = box("mdia", hdlr ++ minf)
      box("trak", tkhd ++ mdia)
    }
    val fieldFourcc = IlstFields.map(_.swap)
    val udta: Array[Byte] =
      if (tags.isEmpty) Array.emptyByteArray
      else {
        val children = tags.flatMap { case (field, value) =>
          val fourcc = beBytes(fieldFourcc(field), 4)
          val data = beBytes(0x00000001L, 4) ++ beBytes(0, 4) ++ // UTF-8 + locale
            value.getBytes("UTF-8")
          val dataAtom = beBytes(8L + data.length, 4) ++
            "data".getBytes("US-ASCII") ++ data
          beBytes(8L + dataAtom.length, 4) ++ fourcc ++ dataAtom
        }.toArray
        val ilst = box("ilst", children)
        val hdlr = box("hdlr", beBytes(0, 4) ++ beBytes(0, 4) ++
          "mdir".getBytes("US-ASCII") ++ new Array[Byte](13))
        // meta is a FullBox: version/flags precede the children
        box("udta", box("meta", beBytes(0, 4) ++ hdlr ++ ilst))
      }
    val moov = box("moov", mvhd ++ traks.flatten.toArray ++ udta)
    val mdat = box("mdat", Array.tabulate[Byte](16)(i => (i * 7).toByte))
    ftyp ++ moov ++ mdat
  }

  /** A spec-layout HEIF still (HEIC/AVIF by brand): ftyp + meta FullBox
    * (hdlr "pict" + iprp/ipco/ispe with the display dims) + stub mdat —
    * no moov, exactly like real camera/encoder output. */
  def heifStub(brand: String, w: Int, h: Int): Array[Byte] = {
    val ftyp = box("ftyp", brand.getBytes("US-ASCII") ++ beBytes(0, 4) ++
      "mif1".getBytes("US-ASCII"))
    val hdlr = box("hdlr", beBytes(0, 4) ++ beBytes(0, 4) ++
      "pict".getBytes("US-ASCII") ++ new Array[Byte](13))
    val ispe = box("ispe", beBytes(0, 4) ++ beBytes(w, 4) ++ beBytes(h, 4))
    val meta = box("meta", beBytes(0, 4) ++ hdlr ++
      box("iprp", box("ipco", ispe)))
    val mdat = box("mdat", Array.tabulate[Byte](24)(i => (i * 11).toByte))
    ftyp ++ meta ++ mdat
  }

  /** An MPEG audio stream: optional ID3v2 tag (syncsafe size over junk
    * body) + one frame header + a noise body. */
  def mp3Stub(verBits: Int, layerBits: Int, brIdx: Int, srIdx: Int,
              mono: Boolean, id3Size: Int): Array[Byte] = {
    val tag: Array[Byte] =
      if (id3Size <= 0) Array.emptyByteArray
      else "ID3".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0) ++
        Array[Byte](((id3Size >> 21) & 0x7F).toByte,
          ((id3Size >> 14) & 0x7F).toByte, ((id3Size >> 7) & 0x7F).toByte,
          (id3Size & 0x7F).toByte) ++
        Array.tabulate[Byte](id3Size)(i => ((i * 31 + 5) & 0x7F).toByte)
    val h1 = (0xE0 | (verBits << 3) | (layerBits << 1) | 1).toByte
    val h2 = ((brIdx << 4) | (srIdx << 2)).toByte
    val h3 = (if (mono) 0xC0 else 0x00).toByte
    tag ++ Array(0xFF.toByte, h1, h2, h3) ++
      Array.tabulate[Byte](96)(i => ((i * 17 + 3) & 0xFF).toByte)
  }

  private def oggPage(headerType: Int, serial: Int, seq: Int,
                      packet: Array[Byte]): Array[Byte] = {
    require(packet.length < 255 * 255, "oggPage: packet too long for one page")
    val nFull = packet.length / 255
    val segs = Array.tabulate[Byte](nFull + 1)(i =>
      if (i < nFull) 255.toByte else (packet.length % 255).toByte)
    "OggS".getBytes("US-ASCII") ++ Array[Byte](0, headerType.toByte) ++
      leBytes(0, 8) ++ leBytes(serial, 4) ++ leBytes(seq, 4) ++
      leBytes(0, 4) ++ Array(segs.length.toByte) ++ segs ++ packet
  }

  /** Ogg/Vorbis: identification-header page + one audio-noise page. */
  def oggVorbisStub(channels: Int, rate: Int): Array[Byte] = {
    val idPacket = Array[Byte](1) ++ "vorbis".getBytes("US-ASCII") ++
      leBytes(0, 4) ++ Array(channels.toByte) ++ leBytes(rate, 4) ++
      leBytes(0, 4) ++ leBytes(rate.toLong * 2, 4) ++ leBytes(0, 4) ++
      Array[Byte](0xB8.toByte, 1)
    oggPage(2, 777, 0, idPacket) ++
      oggPage(0, 777, 1, Array.tabulate[Byte](40)(i => (i * 13).toByte))
  }

  /** Ogg/Opus: OpusHead page + one audio-noise page. */
  def oggOpusStub(channels: Int, rate: Int): Array[Byte] = {
    val idPacket = "OpusHead".getBytes("US-ASCII") ++ Array[Byte](1) ++
      Array(channels.toByte) ++ leBytes(312, 2) ++ leBytes(rate, 4) ++
      leBytes(0, 2) ++ Array[Byte](0)
    oggPage(2, 778, 0, idPacket) ++
      oggPage(0, 778, 1, Array.tabulate[Byte](40)(i => (i * 11).toByte))
  }

  /** The Vorbis-comment block shared by both codecs' comment headers. */
  private def vorbisCommentBlock(comments: Seq[(String, String)]): Array[Byte] = {
    val vendor = "graft-fixture".getBytes("UTF-8")
    val body = new java.io.ByteArrayOutputStream()
    body.write(leBytes(vendor.length, 4), 0, 4)
    body.write(vendor, 0, vendor.length)
    body.write(leBytes(comments.length, 4), 0, 4)
    comments.foreach { case (f, v) =>
      val c = s"$f=$v".getBytes("UTF-8")
      body.write(leBytes(c.length, 4), 0, 4)
      body.write(c, 0, c.length)
    }
    body.toByteArray
  }

  /** Pages carrying one packet, split so the FIRST page ends on a
    * lacing-255 boundary when `spanPages` (packet longer than 255):
    * the continuation page carries headerType 0x01 — exercising the
    * RFC 3533 cross-page reassembly rules for real. */
  private def commentPages(serial: Int, seqStart: Int, packet: Array[Byte],
                           spanPages: Boolean): Array[Byte] =
    if (spanPages && packet.length > 255) {
      val head = packet.take(255) // one full lacing value, no terminator
      val tail = packet.drop(255)
      val segs = Array[Byte](255.toByte)
      val p1 = "OggS".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++
        leBytes(0, 8) ++ leBytes(serial, 4) ++ leBytes(seqStart, 4) ++
        leBytes(0, 4) ++ Array(segs.length.toByte) ++ segs ++ head
      p1 ++ oggPage(1, serial, seqStart + 1, tail) // 0x01 = continuation
    } else oggPage(0, serial, seqStart, packet)

  /** Ogg/Vorbis with a REAL comment header: id page, comment page(s)
    * (0x03"vorbis" + Vorbis-comment block + framing bit, optionally
    * spanning two pages), then an audio-noise page. */
  def oggVorbisTaggedStub(channels: Int, rate: Int,
                          comments: Seq[(String, String)],
                          spanPages: Boolean = false): Array[Byte] = {
    val idPacket = Array[Byte](1) ++ "vorbis".getBytes("US-ASCII") ++
      leBytes(0, 4) ++ Array(channels.toByte) ++ leBytes(rate, 4) ++
      leBytes(0, 4) ++ leBytes(rate.toLong * 2, 4) ++ leBytes(0, 4) ++
      Array[Byte](0xB8.toByte, 1)
    val commentPacket = Array[Byte](3) ++ "vorbis".getBytes("US-ASCII") ++
      vorbisCommentBlock(comments) ++ Array[Byte](1) // framing bit
    val cp = commentPages(779, 1, commentPacket, spanPages)
    val lastSeq = if (spanPages && commentPacket.length > 255) 3 else 2
    oggPage(2, 779, 0, idPacket) ++ cp ++
      oggPage(0, 779, lastSeq, Array.tabulate[Byte](40)(i => (i * 13).toByte))
  }

  /** Ogg/Opus with a REAL OpusTags header: id page, comment page(s),
    * then an audio-noise page. */
  def oggOpusTaggedStub(channels: Int, rate: Int,
                        comments: Seq[(String, String)],
                        spanPages: Boolean = false): Array[Byte] = {
    val idPacket = "OpusHead".getBytes("US-ASCII") ++ Array[Byte](1) ++
      Array(channels.toByte) ++ leBytes(312, 2) ++ leBytes(rate, 4) ++
      leBytes(0, 2) ++ Array[Byte](0)
    val commentPacket = "OpusTags".getBytes("US-ASCII") ++
      vorbisCommentBlock(comments)
    val cp = commentPages(780, 1, commentPacket, spanPages)
    val lastSeq = if (spanPages && commentPacket.length > 255) 3 else 2
    oggPage(2, 780, 0, idPacket) ++ cp ++
      oggPage(0, 780, lastSeq, Array.tabulate[Byte](40)(i => (i * 11).toByte))
  }
}
