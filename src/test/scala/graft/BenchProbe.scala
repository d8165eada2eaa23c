package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for dev loops (not part of the driver contract). */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    // job accounting: how many actions does the ingest twin issue, and how
    // much wall time do the jobs themselves cover vs driver-side planning?
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobNanos = new java.util.concurrent.atomic.AtomicLong(0L)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            s: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          starts.put(s.jobId, System.nanoTime()): Unit
          jobs.incrementAndGet(): Unit
        }
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val t0 = starts.remove(e.jobId)
          if (t0 != 0L) jobNanos.addAndGet(System.nanoTime() - t0): Unit
        }
      })
    def runTwin(label: String): Unit = {
      val j0 = jobs.get(); val n0 = jobNanos.get()
      time(label) {
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
          .filter(col("doc_id") % 8 < 2)
        graft.stream.CorpusIngest.nearDupIngestTwin(spark,
          docs.filter(col("doc_id") % 2 === 0),
          docs.filter(col("doc_id") % 2 === 1),
          threshold = 0.8, numPerms = 32, bands = 16,
          containmentThreshold = Some(0.5)).count(): Unit
      }
      println(f"PROBE   jobs=${jobs.get() - j0} jobWall=${(jobNanos.get() - n0) / 1e9}%.3f s")
      graft.ops.Caching.releaseAll(spark)
    }
    runTwin("twin-cold")
    runTwin("twin-warm1")
    runTwin("twin-warm2")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    runTwin("twin-noaqe1")
    runTwin("twin-noaqe2")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    runTwin("twin-noaqe-sp8")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    runTwin("twin-aqe-sp8")
    runTwin("twin-aqe-sp8b")
    spark.stop()
  }
}
