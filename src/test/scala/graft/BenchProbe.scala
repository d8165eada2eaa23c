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
    // q223 stage decomposition (second round = steady state)
    for (round <- 1 to 2) {
      val j0 = jobs.get()
      val dir = graft.tables.TempLakes.create("graft_probe_lake")
      val lake = new graft.tables.LakeTable(spark, dir)
      val slice = spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(col("doc_id") % 8 === 1)
      val cfgBase = graft.text.Refinery.Config(shingleVerify = true,
        checkpointStages = true, dedupNumPerms = 32, dedupBands = 16)
      val gated = time(s"r$round gate") {
        val g = graft.text.Refinery.gate(slice, cfgBase).localCheckpoint(true)
        g.count(); g
      }
      val lmKept = time(s"r$round lm-stage") {
        val tail = graft.text.LangModel.perplexityBuckets(gated,
            expr("lang = 'en'"), headPermille = 0, tailPermille = 300)
          .filter(col("bucket") === "tail").select("doc_id")
        gated.join(tail, Seq("doc_id"), "left_anti").localCheckpoint(true)
      }
      println(s"PROBE r$round jobs-after-lm ${jobs.get() - j0}")
      val clfKept = time(s"r$round classifier-stage") {
        val low = graft.text.QualityClassifier.classifierScore(lmKept,
            expr("lang = 'en'"), expr("lang <> 'en'"))
          .filter(col("avg_micronats") < 0L).select("doc_id")
        val bad = lmKept.filter(!coalesce(expr("lang = 'en'"), lit(false)))
          .join(low, Seq("doc_id"), "left_semi").select("doc_id")
        lmKept.join(bad, Seq("doc_id"), "left_anti").localCheckpoint(true)
      }
      println(s"PROBE r$round jobs-after-clf ${jobs.get() - j0}")
      val deduped = time(s"r$round dedup") {
        graft.text.Dedup.dedupCorpusShingle(clfKept, 0.8, 32, 16)
          .localCheckpoint(true)
      }
      println(s"PROBE r$round jobs-after-dedup ${jobs.get() - j0}")
      val contained = time(s"r$round containment") {
        graft.text.Dedup.dropContained(deduped, threshold = 0.8, maxDf = 1000)
          .localCheckpoint(true)
      }
      val survivors = time(s"r$round survivors-write") {
        lake.write(contained.select("doc_id", "source", "lang", "text"),
          "survivors", "overwrite"): Unit
        lake.read("survivors")
      }
      val tr = time(s"r$round cluster-split+write") {
        val split = graft.text.Dedup.clusterSplit(survivors,
          numPerms = 32, bands = 16)
        lake.write(survivors.join(
          split.filter(col("split") === "train").select("doc_id"),
          Seq("doc_id"), "left_semi"), "train_docs", "overwrite"): Unit
        lake.read("train_docs")
      }
      time(s"r$round select+plan+write") {
        val sel = graft.text.TextFeatures.budgetedQualitySelection(tr, 2600L)
        val selDocs = tr.join(sel.select("doc_id"), Seq("doc_id"), "left_semi")
        val plan = graft.text.TextFeatures.budgetedSamplePlan(selDocs, 4000L,
          maxEpochs = 2.0)
        lake.write(plan, "training_plan", "overwrite"): Unit
        lake.read("training_plan").count()
      }
      println(s"PROBE r$round total-jobs ${jobs.get() - j0}")
      graft.ops.Caching.releaseAll(spark)
    }
    spark.stop()
  }
}
