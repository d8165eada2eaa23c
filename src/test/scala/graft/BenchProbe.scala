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
    import graft.multimodal.MediaDedup
    import graft.text.Dedup
    // q238 decomposition (round 2 = steady state)
    for (round <- 1 to 2) {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val images = MediaDedup.syntheticCrossFormatImages(docs)
      val audio = MediaDedup.syntheticNearDupAudio(docs)
      time(s"r$round tp") {
        println("n=" + Dedup.minhashNearDupsShingle(docs, 32, 16, 3, 0.8).count())
      }
      time(s"r$round ip") {
        println("n=" + MediaDedup.imageNearDups(images, 3, 4).count())
      }
      time(s"r$round ap") {
        println("n=" + MediaDedup.audioNearDups(audio, 3, 4).count())
      }
      time(s"r$round pairs") {
        println("n=" + MediaDedup.multimodalNearDups(docs, images, audio).count())
      }
      time(s"r$round clusters") {
        println("n=" + MediaDedup.multimodalClusters(docs, images, audio).count())
      }
      graft.ops.Caching.releaseAll(spark)
    }
    spark.stop()
  }
}
