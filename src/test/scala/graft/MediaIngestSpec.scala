package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.multimodal.Multimodal.{Containers, MediaRow}
import graft.stream.MediaIngest
import graft.tables.LakeTable

class MediaIngestSpec extends SparkSpec {

  // 16x16 image with grayscale planted per 2x2 grid block (the
  // MediaDedupSpec fixture): the 8x8 block means ARE the planted values
  private def pngImage(id: Long, gray: (Int, Int) => Int,
                       filterType: Int = 0): MediaRow = {
    val px: Int => Int = i =>
      if (i % 4 == 3) 255 else gray(((i / 4) % 16) / 2, ((i / 4) / 16) / 2)
    MediaRow(id, "image", Containers.pngFull(16, 16, px, filterType), 16, 16, 1)
  }

  private def gifImage(id: Long, gray: (Int, Int) => Int): MediaRow =
    MediaRow(id, "image",
      Containers.gifFull(16, 16, k => gray((k % 16) / 2, (k / 16) / 2),
        Array.tabulate(256 * 3)(b => (b / 3).toByte), minCodeSize = 8),
      16, 16, 1)

  private def writeBatchFile(dir: String, name: String,
                             rows: Seq[MediaRow]): Unit = {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-media-stage").toString + "/out"
    rows.toDS().toDF().coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, java.nio.file.Paths.get(s"$dir/$name.parquet"))
  }

  private val up: (Int, Int) => Int = (bx, _) => bx * 10
  private val down: (Int, Int) => Int = (bx, _) => (7 - bx) * 10
  private val mixed: (Int, Int) => Int =
    (bx, by) => if (by < 4) bx * 10 else (7 - bx) * 10

  test("streamed media: in-batch, cross-batch, and cross-format perceptual " +
    "dups drop; replays are idempotent; stream == twin") {
    val in = Files.createTempDirectory("graft-media-in").toString
    val lakeDir = Files.createTempDirectory("graft-media-lake").toString
    val lake = new LakeTable(spark, lakeDir)

    val b1 = Seq(
      pngImage(1, up),                 // canonical
      pngImage(2, up, filterType = 4), // in-batch re-encode of 1 (hamming 0)
      pngImage(3, down))               // distinct (hamming 56 from 1)
    val b2 = Seq(
      gifImage(4, up),                 // CROSS-FORMAT re-encode of committed 1
      pngImage(5, mixed))              // novel (hamming 28 from both)
    writeBatchFile(in, "b1", b1)
    val q1 = MediaIngest.startPerceptualDedup(spark, in, lake, "media",
      trigger = Trigger.AvailableNow())
    q1.awaitTermination(120000)
    assert(q1.exception.isEmpty)
    assert(lake.read("media").select("media_id").collect()
      .map(_.getLong(0)).toSet === Set(1L, 3L))

    writeBatchFile(in, "b2", b2)
    val q2 = MediaIngest.startPerceptualDedup(spark, in, lake, "media",
      trigger = Trigger.AvailableNow())
    q2.awaitTermination(120000)
    assert(q2.exception.isEmpty)
    assert(lake.read("media").select("media_id").collect()
      .map(_.getLong(0)).toSet === Set(1L, 3L, 5L))

    // replay with no checkpoint: the lake is the fingerprint index, so
    // reprocessing every file lands nothing new
    val q3 = MediaIngest.startPerceptualDedup(spark, in, lake, "media",
      trigger = Trigger.AvailableNow())
    q3.awaitTermination(120000)
    assert(q3.exception.isEmpty)
    assert(lake.read("media").select("media_id").collect()
      .map(_.getLong(0)).toSet === Set(1L, 3L, 5L))

    // the deterministic twin lands exactly the same (media_id, dhash) set
    import spark.implicits._
    val twin = MediaIngest.perceptualIngestTwin(spark,
      b1.toDS().toDF(), b2.toDS().toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val landed = lake.read("media").select("media_id", "dhash")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(twin === landed)
  }

  // 570-sample PCM16 clip: window j (57 windows of 10 samples) at amp(j)
  private def wavClip(id: Long, amp: Int => Int): MediaRow = {
    val n = 570
    val body = new Array[Byte](n * 2)
    var p = 0
    while (p < n) {
      val s = amp(p / 10)
      body(2 * p) = (s & 0xFF).toByte
      body(2 * p + 1) = ((s >> 8) & 0xFF).toByte
      p += 1
    }
    MediaRow(id, "audio", Containers.wav(1, 16000, body), 0, 0, 1)
  }

  test("streamed audio: in-batch and cross-batch volume-scaled contour " +
    "dups drop; replays idempotent; stream == twin") {
    val in = Files.createTempDirectory("graft-audio-in").toString
    val lake = new LakeTable(spark,
      Files.createTempDirectory("graft-audio-lake").toString)
    // contour = t prefix-ones (energies rise through window t, then flat)
    def clip(id: Long, t: Int, scale: Int = 1) =
      wavClip(id, j => math.min(j, t) * 10 * scale)
    val b1 = Seq(
      clip(1, 10),            // canonical
      clip(2, 10, scale = 3), // in-batch volume-scaled copy of 1
      clip(3, 30))            // distinct (hamming 20 from 1)
    val b2 = Seq(
      clip(4, 10, scale = 2), // cross-batch volume-scaled copy of committed 1
      clip(5, 50))            // novel
    writeBatchFile(in, "b1", b1)
    val q1 = MediaIngest.startAudioDedup(spark, in, lake, "media",
      trigger = Trigger.AvailableNow())
    q1.awaitTermination(120000)
    assert(q1.exception.isEmpty)
    assert(lake.read("media").select("media_id").collect()
      .map(_.getLong(0)).toSet === Set(1L, 3L))
    writeBatchFile(in, "b2", b2)
    val q2 = MediaIngest.startAudioDedup(spark, in, lake, "media",
      trigger = Trigger.AvailableNow())
    q2.awaitTermination(120000)
    assert(q2.exception.isEmpty)
    assert(lake.read("media").select("media_id").collect()
      .map(_.getLong(0)).toSet === Set(1L, 3L, 5L))
    // no-checkpoint replay: the lake is the contour index
    val q3 = MediaIngest.startAudioDedup(spark, in, lake, "media",
      trigger = Trigger.AvailableNow())
    q3.awaitTermination(120000)
    assert(q3.exception.isEmpty)
    assert(lake.read("media").select("media_id").collect()
      .map(_.getLong(0)).toSet === Set(1L, 3L, 5L))
    // stream == deterministic twin
    import spark.implicits._
    val twin = MediaIngest.audioIngestTwin(spark,
      b1.toDS().toDF(), b2.toDS().toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val landed = lake.read("media").select("media_id", "dhash")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(twin === landed)
  }

  // 16x16 video whose frame f's grayscale is planted per 2x2 block from
  // the given per-frame gray functions (the image fixture, per frame)
  private def aviVideo(id: Long, frames: Seq[(Int, Int) => Int]): MediaRow =
    MediaRow(id, "video",
      Containers.aviFull(16, 16, frames.length,
        (f, x, y, _) => frames(f)(x / 2, y / 2)), 16, 16, frames.length)

  test("streamed video: shared-frame containment drops in-batch and " +
    "cross-batch re-cuts; replays idempotent; stream == twin") {
    val mixed2: (Int, Int) => Int =
      (bx, by) => if (by < 4) (7 - bx) * 10 else bx * 10
    val in = Files.createTempDirectory("graft-video-in").toString
    val lakeDir = Files.createTempDirectory("graft-video-lake").toString
    val lake = new LakeTable(spark, lakeDir)

    // everyN = 2 samples frames 0 and 2 of each 3-frame video
    val b1 = Seq(
      aviVideo(1, Seq(up, down, mixed)),  // canonical: sampled {up, mixed}
      aviVideo(2, Seq(up, up, mixed)),    // in-batch re-cut of 1 (same bag)
      aviVideo(3, Seq(down, up, down)))   // distinct: sampled {down, down}
    val b2 = Seq(
      aviVideo(4, Seq(mixed, up, up)),    // cross-batch REORDERED copy of 1
      aviVideo(5, Seq(mixed2, up, mixed2))) // novel: sampled {m2, m2}
    writeBatchFile(in, "b1", b1)
    val q1 = MediaIngest.startVideoDedup(spark, in, lake, "media",
      trigger = Trigger.AvailableNow())
    q1.awaitTermination(120000)
    assert(q1.exception.isEmpty)
    assert(lake.read("media").select("media_id").collect()
      .map(_.getLong(0)).toSet === Set(1L, 3L))

    writeBatchFile(in, "b2", b2)
    val q2 = MediaIngest.startVideoDedup(spark, in, lake, "media",
      trigger = Trigger.AvailableNow())
    q2.awaitTermination(120000)
    assert(q2.exception.isEmpty)
    assert(lake.read("media").select("media_id").collect()
      .map(_.getLong(0)).toSet === Set(1L, 3L, 5L))

    // replay with no checkpoint: the frame index is the dedup state
    val q3 = MediaIngest.startVideoDedup(spark, in, lake, "media",
      trigger = Trigger.AvailableNow())
    q3.awaitTermination(120000)
    assert(q3.exception.isEmpty)
    assert(lake.read("media").select("media_id").collect()
      .map(_.getLong(0)).toSet === Set(1L, 3L, 5L))
    // the frame index holds exactly the admitted videos' sampled frames
    assert(lake.read("media_frames").select("media_id", "frame_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet ===
      Set((1L, 0), (1L, 2), (3L, 0), (3L, 2), (5L, 0), (5L, 2)))

    // the deterministic twin lands exactly the same frame index
    import spark.implicits._
    val twin = MediaIngest.videoIngestTwin(spark,
      b1.toDS().toDF(), b2.toDS().toDF())
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val landed = lake.read("media_frames")
      .select("media_id", "frame_idx", "dhash")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(twin === landed)
  }

  test("a JPEG re-encode and a FLAC re-encode arriving in the streams are " +
    "rejected against committed PNG/WAV content (format-blind ingest)") {
    import spark.implicits._
    // image side: 64x64 with 8x8-px constant cells so the JPEG stays
    // DC-only (the q252 closed form) and the dHash grids align exactly
    def cellGray(bx: Int, by: Int): Int =
      (7 + bx * bx * 5 + by * by * 3 + bx * by * 11) % 256
    val png64 = MediaRow(1, "image", Containers.pngFull(64, 64, { i =>
      if (i % 4 == 3) 255
      else { val k = i / 4; cellGray((k % 64) / 8, (k / 64) / 8) }
    }), 64, 64, 1)
    val jpeg64 = MediaRow(2, "image", graft.multimodal.Jpeg.encodeGrayBlocks(
      64, 64, Array.tabulate(64)(c => cellGray(c % 8, c / 8)), color = true),
      64, 64, 1)
    val in = Files.createTempDirectory("graft-jpeg-in").toString
    val lake = new LakeTable(spark,
      Files.createTempDirectory("graft-jpeg-lake").toString)
    writeBatchFile(in, "b1", Seq(png64))
    val q1 = MediaIngest.startPerceptualDedup(spark, in, lake, "media",
      trigger = Trigger.AvailableNow())
    q1.awaitTermination(120000)
    assert(q1.exception.isEmpty)
    writeBatchFile(in, "b2", Seq(jpeg64))
    val q2 = MediaIngest.startPerceptualDedup(spark, in, lake, "media",
      trigger = Trigger.AvailableNow())
    q2.awaitTermination(120000)
    assert(q2.exception.isEmpty)
    assert(lake.read("media").select("media_id").collect()
      .map(_.getLong(0)).toSet === Set(1L),
      "the JPEG re-encode of committed PNG content must be rejected")

    // audio side: a FLAC re-encode of a committed WAV clip carries the
    // SAME samples (lossless), hence the same contour fingerprint
    val samples = Array.tabulate(570)(p =>
      ((p.toLong * p * 19 + p * 23 + 3) % 4096 - 2048).toInt)
    val body = new Array[Byte](samples.length * 2)
    samples.indices.foreach { p =>
      body(2 * p) = (samples(p) & 0xFF).toByte
      body(2 * p + 1) = ((samples(p) >> 8) & 0xFF).toByte
    }
    val wavRow = MediaRow(11, "audio", Containers.wav(1, 16000, body), 0, 0, 1)
    val flacRow = MediaRow(12, "audio",
      graft.multimodal.Flac.encode(samples), 0, 0, 1)
    val inA = Files.createTempDirectory("graft-flac-in").toString
    val lakeA = new LakeTable(spark,
      Files.createTempDirectory("graft-flac-lake").toString)
    def writeAudio(name: String, rows: Seq[MediaRow]): Unit = {
      val tmp = Files.createTempDirectory("graft-flac-stage").toString + "/out"
      rows.toDS().toDF().coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, java.nio.file.Paths.get(s"$inA/$name.parquet"))
    }
    writeAudio("b1", Seq(wavRow))
    val qa1 = MediaIngest.startAudioDedup(spark, inA, lakeA, "media",
      trigger = Trigger.AvailableNow())
    qa1.awaitTermination(120000)
    assert(qa1.exception.isEmpty)
    writeAudio("b2", Seq(flacRow))
    val qa2 = MediaIngest.startAudioDedup(spark, inA, lakeA, "media",
      trigger = Trigger.AvailableNow())
    qa2.awaitTermination(120000)
    assert(qa2.exception.isEmpty)
    assert(lakeA.read("media").select("media_id").collect()
      .map(_.getLong(0)).toSet === Set(11L),
      "the FLAC re-encode of a committed WAV clip must be rejected")
  }

  test("this round's layouts arrive in the streams and are rejected: a " +
    "PROGRESSIVE re-encode of committed baseline JPEG content, and a " +
    "PARTIAL-FRAME GIF re-cut of a committed AVI") {
    import spark.implicits._
    // image side: baseline JPEG committed, progressive re-encode arrives
    def cellGray(bx: Int, by: Int): Int =
      (19 + bx * bx * 7 + by * by * 5 + bx * by * 9) % 256
    val grays = Array.tabulate(64)(c => cellGray(c % 8, c / 8))
    val baseRow = MediaRow(21, "image",
      graft.multimodal.Jpeg.encodeGrayBlocks(64, 64, grays), 64, 64, 1)
    val progRow = MediaRow(22, "image",
      graft.multimodal.Jpeg.encodeProgressive(64, 64, Array(grays.map { g =>
        val blk = new Array[Int](64)
        blk(0) = g - 128
        blk
      })), 64, 64, 1)
    val in = Files.createTempDirectory("graft-prog-in").toString
    val lake = new LakeTable(spark,
      Files.createTempDirectory("graft-prog-lake").toString)
    writeBatchFile(in, "b1", Seq(baseRow))
    val q1 = MediaIngest.startPerceptualDedup(spark, in, lake, "media",
      trigger = Trigger.AvailableNow())
    q1.awaitTermination(120000)
    assert(q1.exception.isEmpty)
    writeBatchFile(in, "b2", Seq(progRow))
    val q2 = MediaIngest.startPerceptualDedup(spark, in, lake, "media",
      trigger = Trigger.AvailableNow())
    q2.awaitTermination(120000)
    assert(q2.exception.isEmpty)
    assert(lake.read("media").select("media_id").collect()
      .map(_.getLong(0)).toSet === Set(21L),
      "the progressive re-encode of committed baseline content must be rejected")

    // video side: an AVI committed, then a PARTIAL-FRAME GIF whose
    // composited frames equal the AVI's (frame 1 re-draws only the
    // changed rect over frame 0) arrives
    val w = 16; val h = 12
    def f0(x: Int, y: Int): Int = (x * 5 + y * 7 + 13) % 256
    def f1(x: Int, y: Int): Int =
      if (x >= 4 && x < 12 && y >= 4 && y < 10) (x * 11 + y * 3 + 40) % 256
      else f0(x, y)
    val avi = MediaRow(31, "video", Containers.aviFull(w, h, 2,
      (f, x, y, _) => if (f == 0) f0(x, y) else f1(x, y)), w, h, 2)
    val gifPal = Array.tabulate(256 * 3)(b => (b / 3).toByte)
    val gif = MediaRow(32, "video", Containers.gifAnimatedPartial(w, h, Seq(
      Containers.GifFrameSpec(0, 0, w, h, k => f0(k % w, k / w)),
      Containers.GifFrameSpec(4, 4, 8, 6,
        k => f1(4 + k % 8, 4 + k / 8))), gifPal, minCodeSize = 8), w, h, 2)
    val inV = Files.createTempDirectory("graft-pgif-in").toString
    val lakeV = new LakeTable(spark,
      Files.createTempDirectory("graft-pgif-lake").toString)
    writeBatchFile(inV, "b1", Seq(avi))
    val qv1 = MediaIngest.startVideoDedup(spark, inV, lakeV, "media",
      trigger = Trigger.AvailableNow())
    qv1.awaitTermination(120000)
    assert(qv1.exception.isEmpty)
    writeBatchFile(inV, "b2", Seq(gif))
    val qv2 = MediaIngest.startVideoDedup(spark, inV, lakeV, "media",
      trigger = Trigger.AvailableNow())
    qv2.awaitTermination(120000)
    assert(qv2.exception.isEmpty)
    assert(lakeV.read("media").select("media_id").collect()
      .map(_.getLong(0)).toSet === Set(31L),
      "the partial-frame GIF re-cut of a committed AVI must be rejected")
  }

  test("a LOSSY VP8 WebP re-encode of committed PNG content arriving in " +
    "the stream is rejected (the dHash bits survive the codec because " +
    "the display map is strictly increasing over the planted values)") {
    import spark.implicits._
    def cellGray(bx: Int, by: Int): Int =
      ((bx * bx * 9 + by * by * 7 + bx * by * 5 + 23) % 54) * 4 + 16
    val png = MediaRow(61, "image", Containers.pngFull(32, 32, { i =>
      if (i % 4 == 3) 255
      else { val k = i / 4; cellGray((k % 32) / 4, (k / 32) / 4) }
    }), 32, 32, 1)
    val lossy = MediaRow(62, "image",
      graft.multimodal.Vp8Enc.encodeCellGrayWebp(32, 32,
        Array.tabulate(64)(k => cellGray(k % 8, k / 8))), 32, 32, 1)
    val in = Files.createTempDirectory("graft-vp8-in").toString
    val lake = new LakeTable(spark,
      Files.createTempDirectory("graft-vp8-lake").toString)
    writeBatchFile(in, "b1", Seq(png))
    val q1 = MediaIngest.startPerceptualDedup(spark, in, lake, "media",
      trigger = Trigger.AvailableNow())
    q1.awaitTermination(120000)
    assert(q1.exception.isEmpty)
    writeBatchFile(in, "b2", Seq(lossy))
    val q2 = MediaIngest.startPerceptualDedup(spark, in, lake, "media",
      trigger = Trigger.AvailableNow())
    q2.awaitTermination(120000)
    assert(q2.exception.isEmpty)
    assert(lake.read("media").select("media_id").collect()
      .map(_.getLong(0)).toSet === Set(61L),
      "the LOSSY re-encode of committed PNG content must be rejected")
  }

  test("WebP arrivals are rejected: a VP8L re-encode of committed PNG " +
    "content, and an animated-WebP re-cut of a committed GIF animation") {
    import spark.implicits._
    // image side: PNG committed, a WebP VP8L re-encode of the SAME
    // pixels arrives — lossless, so the dHash collides through the
    // format-blind decodeStillRgba dispatch with zero ingest changes
    def cellGray(bx: Int, by: Int): Int =
      (23 + bx * bx * 9 + by * by * 7 + bx * by * 5) % 256
    val png = MediaRow(41, "image", Containers.pngFull(64, 64, { i =>
      if (i % 4 == 3) 255
      else { val k = i / 4; cellGray((k % 64) / 8, (k / 64) / 8) }
    }), 64, 64, 1)
    val webp = MediaRow(42, "image", graft.multimodal.Webp.encodeLossless(
      64, 64, Array.tabulate(64 * 64) { k =>
        val v = cellGray((k % 64) / 8, (k / 64) / 8)
        0xFF000000 | (v << 16) | (v << 8) | v
      }), 64, 64, 1)
    val in = Files.createTempDirectory("graft-webp-in").toString
    val lake = new LakeTable(spark,
      Files.createTempDirectory("graft-webp-lake").toString)
    writeBatchFile(in, "b1", Seq(png))
    val q1 = MediaIngest.startPerceptualDedup(spark, in, lake, "media",
      trigger = Trigger.AvailableNow())
    q1.awaitTermination(120000)
    assert(q1.exception.isEmpty)
    writeBatchFile(in, "b2", Seq(webp))
    val q2 = MediaIngest.startPerceptualDedup(spark, in, lake, "media",
      trigger = Trigger.AvailableNow())
    q2.awaitTermination(120000)
    assert(q2.exception.isEmpty)
    assert(lake.read("media").select("media_id").collect()
      .map(_.getLong(0)).toSet === Set(41L),
      "the WebP re-encode of committed PNG content must be rejected")

    // video side: an animated GIF committed, then an animated WebP whose
    // composited ANMF frames equal the GIF's composited frames arrives
    val w = 16; val h = 12
    def g0(x: Int, y: Int): Int = (x * 7 + y * 5 + 29) % 256
    def g1(x: Int, y: Int): Int = (x * 3 + y * 13 + 61) % 256
    val gifPal = Array.tabulate(256 * 3)(b => (b / 3).toByte)
    val gif = MediaRow(51, "video", Containers.gifAnimated(w, h, 2,
      (f, k) => if (f == 0) g0(k % w, k / w) else g1(k % w, k / w),
      gifPal, minCodeSize = 8), w, h, 2)
    def frameArgb(g: (Int, Int) => Int): Array[Int] =
      Array.tabulate(w * h) { k =>
        val v = g(k % w, k / w)
        0xFF000000 | (v << 16) | (v << 8) | v
      }
    val webpAnim = MediaRow(52, "video", graft.multimodal.Webp.encodeAnimated(
      w, h, 0xFF000000, Seq(
        graft.multimodal.Webp.AnimFrameSpec(0, 0, w, h, frameArgb(g0)),
        graft.multimodal.Webp.AnimFrameSpec(0, 0, w, h, frameArgb(g1)))),
      w, h, 2)
    val inV = Files.createTempDirectory("graft-wanim-in").toString
    val lakeV = new LakeTable(spark,
      Files.createTempDirectory("graft-wanim-lake").toString)
    writeBatchFile(inV, "b1", Seq(gif))
    val qv1 = MediaIngest.startVideoDedup(spark, inV, lakeV, "media",
      trigger = Trigger.AvailableNow())
    qv1.awaitTermination(120000)
    assert(qv1.exception.isEmpty)
    writeBatchFile(inV, "b2", Seq(webpAnim))
    val qv2 = MediaIngest.startVideoDedup(spark, inV, lakeV, "media",
      trigger = Trigger.AvailableNow())
    qv2.awaitTermination(120000)
    assert(qv2.exception.isEmpty)
    assert(lakeV.read("media").select("media_id").collect()
      .map(_.getLong(0)).toSet === Set(51L),
      "the animated-WebP re-cut of a committed GIF must be rejected")
  }

  test("this round's formats arrive in the streams and are rejected: a " +
    "compressed-TIFF re-encode of committed PNG content, an APNG re-cut " +
    "of a committed GIF animation, and an AU re-encode of a WAV clip") {
    import spark.implicits._
    // image: PNG committed, then an LZW+predictor TIFF of the SAME
    // grays — lossless through a different codec family entirely
    def cellGray(bx: Int, by: Int): Int =
      (31 + bx * bx * 11 + by * by * 5 + bx * by * 7) % 256
    val png = MediaRow(71, "image", Containers.pngFull(64, 64, { i =>
      if (i % 4 == 3) 255
      else { val k = i / 4; cellGray((k % 64) / 8, (k / 64) / 8) }
    }), 64, 64, 1)
    val tif = MediaRow(72, "image", graft.multimodal.Raster.tiff(64, 64, 1, 1,
      k => cellGray((k % 64) / 8, (k / 64) / 8), rowsPerStrip = 16,
      compression = 5, predictor = 2), 64, 64, 1)
    val in = Files.createTempDirectory("graft-tifi-in").toString
    val lake = new LakeTable(spark,
      Files.createTempDirectory("graft-tifi-lake").toString)
    writeBatchFile(in, "b1", Seq(png))
    val q1 = MediaIngest.startPerceptualDedup(spark, in, lake, "media",
      trigger = Trigger.AvailableNow())
    q1.awaitTermination(120000)
    assert(q1.exception.isEmpty)
    writeBatchFile(in, "b2", Seq(tif))
    val q2 = MediaIngest.startPerceptualDedup(spark, in, lake, "media",
      trigger = Trigger.AvailableNow())
    q2.awaitTermination(120000)
    assert(q2.exception.isEmpty)
    assert(lake.read("media").select("media_id").collect()
      .map(_.getLong(0)).toSet === Set(71L),
      "the compressed-TIFF re-encode of committed PNG content must be rejected")

    // video: a GIF animation committed, then an APNG whose composited
    // fcTL/fdAT frames equal the GIF's composited frames
    val w = 16; val h = 12
    def g0(x: Int, y: Int): Int = (x * 7 + y * 5 + 37) % 256
    def g1(x: Int, y: Int): Int = (x * 3 + y * 13 + 67) % 256
    val gifPal = Array.tabulate(256 * 3)(b => (b / 3).toByte)
    val gif = MediaRow(81, "video", Containers.gifAnimated(w, h, 2,
      (f, k) => if (f == 0) g0(k % w, k / w) else g1(k % w, k / w),
      gifPal, minCodeSize = 8), w, h, 2)
    def frameSpec(g: (Int, Int) => Int) =
      Containers.ApngFrameSpec(0, 0, w, h, { i =>
        if (i % 4 == 3) 255 else g((i / 4) % w, (i / 4) / w)
      })
    val apng = MediaRow(82, "video",
      Containers.pngAnimated(w, h, Seq(frameSpec(g0), frameSpec(g1))),
      w, h, 2)
    val inV = Files.createTempDirectory("graft-apng-in").toString
    val lakeV = new LakeTable(spark,
      Files.createTempDirectory("graft-apng-lake").toString)
    writeBatchFile(inV, "b1", Seq(gif))
    val qv1 = MediaIngest.startVideoDedup(spark, inV, lakeV, "media",
      trigger = Trigger.AvailableNow())
    qv1.awaitTermination(120000)
    assert(qv1.exception.isEmpty)
    writeBatchFile(inV, "b2", Seq(apng))
    val qv2 = MediaIngest.startVideoDedup(spark, inV, lakeV, "media",
      trigger = Trigger.AvailableNow())
    qv2.awaitTermination(120000)
    assert(qv2.exception.isEmpty)
    assert(lakeV.read("media").select("media_id").collect()
      .map(_.getLong(0)).toSet === Set(81L),
      "the APNG re-cut of a committed GIF must be rejected")

    // audio: a WAV clip committed, then the SAME samples as a Sun AU
    // (PCM16 big-endian — lossless, byte-different container)
    val samples = Array.tabulate(570)(p =>
      ((p.toLong * p * 29 + p * 17 + 9) % 4096 - 2048).toInt)
    val body = new Array[Byte](samples.length * 2)
    samples.indices.foreach { p =>
      body(2 * p) = (samples(p) & 0xFF).toByte
      body(2 * p + 1) = ((samples(p) >> 8) & 0xFF).toByte
    }
    val beBody = new Array[Byte](samples.length * 2)
    samples.indices.foreach { p =>
      beBody(2 * p) = ((samples(p) >> 8) & 0xFF).toByte
      beBody(2 * p + 1) = (samples(p) & 0xFF).toByte
    }
    val wavRow = MediaRow(91, "audio", Containers.wav(1, 16000, body), 0, 0, 1)
    val auRow = MediaRow(92, "audio",
      Containers.au(1, 16000, 3, beBody), 0, 0, 1)
    val inA = Files.createTempDirectory("graft-au-in").toString
    val lakeA = new LakeTable(spark,
      Files.createTempDirectory("graft-au-lake").toString)
    writeBatchFile(inA, "b1", Seq(wavRow))
    val qa1 = MediaIngest.startAudioDedup(spark, inA, lakeA, "media",
      trigger = Trigger.AvailableNow())
    qa1.awaitTermination(120000)
    assert(qa1.exception.isEmpty)
    writeBatchFile(inA, "b2", Seq(auRow))
    val qa2 = MediaIngest.startAudioDedup(spark, inA, lakeA, "media",
      trigger = Trigger.AvailableNow())
    qa2.awaitTermination(120000)
    assert(qa2.exception.isEmpty)
    assert(lakeA.read("media").select("media_id").collect()
      .map(_.getLong(0)).toSet === Set(91L),
      "the AU re-encode of a committed WAV clip must be rejected")
  }

  // joint (caption, image, audio) item: any-modality dedup fixtures
  private def jointItem(id: Long, caption: String, gray: (Int, Int) => Int,
                        clip: Int => Int): (Long, String, Array[Byte], Array[Byte]) = {
    val n = 570
    val body = new Array[Byte](n * 2)
    var p = 0
    while (p < n) {
      val s = clip(p)
      body(2 * p) = (s & 0xFF).toByte
      body(2 * p + 1) = ((s >> 8) & 0xFF).toByte
      p += 1
    }
    val png = Containers.pngFull(16, 16,
      i => if (i % 4 == 3) 255 else gray(((i / 4) % 16) / 2, ((i / 4) / 16) / 2))
    (id, caption, png, Containers.wav(1, 16000, body))
  }

  test("streamed JOINT items: a match in ANY modality drops — in-batch, " +
    "cross-batch, each modality; replays idempotent; stream == twin") {
    import spark.implicits._
    val checker: (Int, Int) => Int =
      (bx, by) => if ((bx + by) % 2 == 0) 200 else 20
    // per-clip quadratic coefficients (the degeneracy-free shape)
    def clip(c: Int): Int => Int =
      p => ((p.toLong * p * (31 + c * 7) + p.toLong * (17 + c * 11) + c * 53)
        % 4096 - 2048).toInt
    // two more pairwise-distant gradients. NOTE: item 8's image must stay
    // >3 Hamming from EVERY item — batch-1 ones included — because the
    // no-checkpoint replay below reprocesses all files as ONE batch, where
    // an accidental collision with (dropped) item 3 would pull 8 into
    // item 1's in-batch component and break replay idempotency (hstripe's
    // constant rows hash to 0 == down's hash — measured, hence mixed2)
    val vstripe: (Int, Int) => Int = (bx, _) => if (bx % 2 == 0) 200 else 20
    val mixed2: (Int, Int) => Int =
      (bx, by) => if (by < 4) (7 - bx) * 10 else bx * 10
    val capA = "the quick brown fox jumps over the lazy dog near the river bank"
    val capB = "completely different words describing an unrelated scene entirely"
    val capC = "a third caption sharing nothing with either of those two texts"
    val capD = "yet another wholly distinct description for the final novel item"
    val capE = "fifth standalone caption used only by the rewritten repost case"
    val capF = "sixth caption belonging to the genuinely new item that must land"

    val b1 = Seq(
      jointItem(1, capA, up, clip(1)),      // canonical
      jointItem(2, capB, up, clip(2)),      // in-batch IMAGE dup of 1
      jointItem(3, capA, down, clip(3)),    // in-batch TEXT dup of 1
      jointItem(4, capC, mixed, clip(4)))   // distinct survivor
    val b2 = Seq(
      jointItem(5, capE, up, clip(5)),      // cross-batch IMAGE repost of 1
      jointItem(6, capC, checker, clip(6)), // cross-batch TEXT repost of 4
      jointItem(7, capD, vstripe, clip(1)), // cross-batch AUDIO repost of 1
      jointItem(8, capF, mixed2, clip(8))) // genuinely novel
    // expected: batch1 lands {1, 4}; batch2 has no in-batch pairs, and the
    // lake checks reject 5 (image vs 1), 6 (text vs 4), 7 (audio vs 1)
    val in = Files.createTempDirectory("graft-joint-in").toString
    val lake = new LakeTable(spark,
      Files.createTempDirectory("graft-joint-lake").toString)
    def writeJoint(name: String,
                   rows: Seq[(Long, String, Array[Byte], Array[Byte])]): Unit = {
      val tmp = Files.createTempDirectory("graft-joint-stage").toString + "/out"
      rows.toDF("item_id", "text", "image", "audio")
        .coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, java.nio.file.Paths.get(s"$in/$name.parquet"))
    }
    writeJoint("b1", b1)
    val q1 = MediaIngest.startJointDedup(spark, in, lake, "items",
      trigger = Trigger.AvailableNow())
    q1.awaitTermination(120000)
    assert(q1.exception.isEmpty)
    assert(lake.read("items").select("item_id").collect()
      .map(_.getLong(0)).toSet === Set(1L, 4L))

    writeJoint("b2", b2)
    val q2 = MediaIngest.startJointDedup(spark, in, lake, "items",
      trigger = Trigger.AvailableNow())
    q2.awaitTermination(120000)
    assert(q2.exception.isEmpty)
    assert(lake.read("items").select("item_id").collect()
      .map(_.getLong(0)).toSet === Set(1L, 4L, 8L),
      "batch-2 rejections: 5 by image vs 1, 6 by text vs 4, 7 by audio " +
        "vs 1; 8 lands")

    // no-checkpoint replay: the committed items ARE the joint index
    val q3 = MediaIngest.startJointDedup(spark, in, lake, "items",
      trigger = Trigger.AvailableNow())
    q3.awaitTermination(120000)
    assert(q3.exception.isEmpty)
    assert(lake.read("items").select("item_id").collect()
      .map(_.getLong(0)).toSet === Set(1L, 4L, 8L))

    // stream == deterministic twin, fingerprints included
    val twin = MediaIngest.jointIngestTwin(spark,
      b1.toDF("item_id", "text", "image", "audio"),
      b2.toDF("item_id", "text", "image", "audio"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val landed = lake.read("items").select("item_id", "dhash", "afp")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(twin === landed)
  }
}
