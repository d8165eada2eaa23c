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
}
