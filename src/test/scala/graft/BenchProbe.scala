package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for dev loops (not part of the driver contract). */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("PROBE_SHUFFLE", "32"))
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("PROBE_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            s: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(): Unit
        }
      })
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val j0 = jobs.get(); val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.3f s " +
        s"jobs=${jobs.get() - j0}"); r
    }
    import graft.multimodal.{MediaDedup, Multimodal}
    import graft.text.Dedup
    // inlined videoBatchBody with per-stage timing (steady state = round 2)
    for (round <- 1 to 2) {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(expr(sys.env.getOrElse("PROBE_SLICE", "(doc_id div 3) % 2 = 0")))
      val media = MediaDedup.syntheticNearDupVideos(docs).toDF()
      val dir = graft.tables.TempLakes.create("probe_video_lake")
      val lake = new graft.tables.LakeTable(spark, dir)
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      for ((batchDf, bn) <- Seq(media.filter(col("media_id") % 2 === 0) -> 1,
                                media.filter(col("media_id") % 2 === 1) -> 2)) {
        import spark.implicits._
        val table = "media"; val frameTable = "media_frames"
        val m = batchDf.as[Multimodal.MediaRow]
        val fh = MediaDedup.videoFrameHashes(m, 2).persist()
        val counts = fh.groupBy(col("media_id")).agg(count(lit(1)).as("n_frames"))
        val pairs = time(s"r$round b$bn pairs") {
          MediaDedup.videoContainment(
              MediaDedup.videoFramePairs(fh, 3, 4), counts, counts)
            .filter(col("match_frac") >= 0.5)
            .select(col("media_a").as("doc_a"), col("media_b").as("doc_b"))
        }
        val clusters = time(s"r$round b$bn closure") {
          Dedup.clusterPairs(pairs).withColumnRenamed("doc_id", "media_id")
        }
        val kept = counts.join(clusters, Seq("media_id"), "left")
          .filter(col("cluster_id").isNull || col("media_id") === col("cluster_id"))
          .select("media_id", "n_frames")
        val keptFrames = fh.join(kept.select("media_id"), Seq("media_id"))
        val novel = time(s"r$round b$bn lakecheck") {
          if (lake.exists(frameTable)) {
            val committed = lake.read(frameTable)
              .select("media_id", "frame_idx", "dhash")
            val cmCounts = committed.groupBy(col("media_id"))
              .agg(count(lit(1)).as("n_frames"))
            val rejected = MediaDedup.videoContainment(
                MediaDedup.crossFramePairs(keptFrames, committed, 3, 4),
                kept, cmCounts)
              .filter(col("match_frac") >= 0.5)
              .select(col("media_a").as("media_id")).distinct()
            kept.join(rejected, Seq("media_id"), "left_anti")
          } else kept
        }
        time(s"r$round b$bn write-media") {
          val admitted = batchDf.join(novel.select("media_id"), Seq("media_id"))
          val mode = if (lake.exists(table)) "append" else "overwrite"
          lake.write(admitted, table, mode): Unit
        }
        time(s"r$round b$bn write-frames") {
          val frameMode = if (lake.exists(frameTable)) "append" else "overwrite"
          lake.write(fh.join(novel.select("media_id"), Seq("media_id")),
            frameTable, frameMode): Unit
        }
        graft.ops.Caching.release(fh)
      }
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      time(s"r$round readback") {
        lake.read("media_frames")
          .select(col("media_id"), col("frame_idx"), col("dhash")).count()
      }
      graft.ops.Caching.releaseAll(spark)
    }
    spark.stop()
  }
}
