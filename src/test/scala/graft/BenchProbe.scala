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
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            s: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(): Unit
        }
      })
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % 2 === 0)
    // q208 stage decomposition
    for (round <- 1 to 2) {
      val j0 = jobs.get()
      val gated = time(s"r$round gate+persist") {
        val g = graft.text.Refinery.gate(docs,
          graft.text.Refinery.Config()).persist()
        g.count(); g
      }
      val lmKept = time(s"r$round lm-stage") {
        val tail = graft.text.LangModel.perplexityBuckets(gated,
            expr("lang = 'en'"), headPermille = 0, tailPermille = 300)
          .filter(col("bucket") === "tail").select("doc_id")
        val k = gated.join(tail, Seq("doc_id"), "left_anti").persist()
        k.count(); k
      }
      val deduped = time(s"r$round dedupCorpusShingle") {
        val d0 = graft.text.Dedup.dedupCorpusShingle(lmKept, 0.8).persist()
        d0.count(); d0
      }
      time(s"r$round cap+chunk") {
        val capped = deduped.join(
          graft.text.TextFeatures.perSourceCap(deduped, 1000000).select("doc_id"),
          Seq("doc_id"), "left_semi")
        graft.text.TextFeatures.chunkPlan(capped, 128, 96).count()
      }
      println(s"PROBE   r$round jobs=${jobs.get() - j0}")
      graft.ops.Caching.releaseAll(spark)
      System.gc()
    }
    spark.stop()
  }
}
