package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for dev loops (not part of the driver contract).
  * PROBE_SECTION picks the experiment; results land in the round NOTES. */
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
    import graft.text.{Dedup, Refinery, TextFeatures, TextStats}
    import graft.sim.Similarity
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    sys.env.getOrElse("PROBE_SECTION", "q186") match {
      case "q186" =>
        // q186 decomposition: full refinery+containment on the even
        // half-slice vs the same config without the containment stage,
        // plus the containment stage alone over MATERIALIZED survivors —
        // separates the near-dup cost, the containment cost, and any
        // recompute the composition pays on top.
        val half = docs.filter(col("doc_id") % 2 === 0)
        val cfgFull = Refinery.Config(shingleVerify = true,
          nearDupThreshold = 0.98, containment = true,
          containmentThreshold = 0.8, containmentMaxDf = 1000)
        val cfgNoCont = cfgFull.copy(containment = false)
        time("warmup q43-family") {
          Dedup.minhashNearDupsShingle(docs, 32, 16, 3, 0.8).count(): Unit
        }
        for (it <- 1 to 3) {
          time(s"q186/full#$it") { println("n=" +
            Refinery.refine(half, cfgFull).count()) }
          graft.ops.Caching.releaseAll(spark)
          time(s"q186/nocont#$it") { println("n=" +
            Refinery.refine(half, cfgNoCont).count()) }
          graft.ops.Caching.releaseAll(spark)
        }
        // containment stage alone, survivors pre-materialized
        val surv = time("materialize survivors") {
          val gated = Refinery.gate(half, cfgFull)
          Dedup.dedupCorpusShingle(gated, 0.98, 128, 32).localCheckpoint(true)
        }
        for (it <- 1 to 3) {
          time(s"dropContained-alone#$it") { println("n=" +
            Dedup.dropContained(surv, threshold = 0.8, maxDf = 1000).count()) }
          graft.ops.Caching.releaseAll(spark)
          time(s"nearDupPairs-alone#$it") { println("n=" +
            Dedup.minhashNearDupsShingle(surv, 128, 32, 3, 0.98).count()) }
          graft.ops.Caching.releaseAll(spark)
        }

      case "q44" =>
        // q44 decomposition kept from r14 (recompute vs persisted
        // explode vs (doc, feat) grain) — see NOTES_r14 for readings.
        time("warmup q43-family") {
          Dedup.minhashNearDupsShingle(docs, 32, 16, 3, 0.8).count(): Unit
        }
        for (it <- 1 to 3) time(s"q44/shipped#$it") {
          val emb = TextFeatures.tfidfEmbeddingsPortable(docs, 256)
          println("n=" + Similarity.bruteForceTopK(emb,
            emb.filter(col("vec_id") < 200), 3).count())
          graft.ops.Caching.releaseAll(spark)
        }

      case other => println(s"unknown PROBE_SECTION $other")
    }
    spark.stop()
  }
}
