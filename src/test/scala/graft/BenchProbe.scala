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
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            s: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(): Unit
        }
      })
    // q232 stage decomposition (second round = steady state)
    for (round <- 1 to 2) {
      val j0 = jobs.get()
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val media = time(s"r$round fixture") {
        graft.multimodal.MediaDedup.syntheticNearDupVideos(docs)
      }
      val pairs = time(s"r$round neardups") {
        val p = graft.multimodal.MediaDedup.videoNearDups(media, everyN = 2)
          .select(col("media_a").as("doc_a"), col("media_b").as("doc_b"))
          .persist()
        println(s"PROBE r$round n_pairs ${p.count()}")
        p
      }
      println(s"PROBE r$round jobs-after-pairs ${jobs.get() - j0}")
      val clusters = time(s"r$round closure") {
        val c = graft.text.Dedup.clusterPairs(pairs)
        println(s"PROBE r$round n_clustered ${c.count()}")
        c
      }
      println(s"PROBE r$round jobs-after-closure ${jobs.get() - j0}")
      time(s"r$round label+window") {
        graft.multimodal.MediaDedup.videoClusters(media, everyN = 2).count()
      }
      println(s"PROBE r$round total-jobs ${jobs.get() - j0}")
      graft.ops.Caching.releaseAll(spark)
    }
    spark.stop()
  }
}
