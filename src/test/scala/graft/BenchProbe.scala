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

      case "schema" =>
        // How much of the per-row fixed floor is parquet schema inference?
        // 50 fresh spark.read.parquet().schema resolutions vs 50 with an
        // explicit (pre-inferred) schema, vs 50 tiny count() actions on each.
        val path = s"$sfDir/orders.parquet"
        val inferred = spark.read.parquet(path).schema
        time("infer x50") {
          (1 to 50).foreach(_ => spark.read.parquet(path).schema: Unit)
        }
        time("explicit x50") {
          (1 to 50).foreach(_ => spark.read.schema(inferred).parquet(path).schema: Unit)
        }
        time("infer+filter-count x50") {
          (1 to 50).foreach(_ => spark.read.parquet(path)
            .filter(col("o_orderkey") < 0).count(): Unit)
        }
        time("explicit+filter-count x50") {
          (1 to 50).foreach(_ => spark.read.schema(inferred).parquet(path)
            .filter(col("o_orderkey") < 0).count(): Unit)
        }

      case "lmhash" =>
        // q200/q208/q209 hot path: pairedEvents computes portableTokenHash
        // (md5 + substr + conv) TWICE per bigram event — each token is
        // hashed once as w1 of event i and again as w2 of event i-1. A/B:
        // the shipped spelling vs hashing the token array ONCE via a
        // higher-order transform (halves md5 evaluations, but the HOF
        // projection is interpreted, not codegen'd — which effect wins?).
        // AMP multiplies the corpus (distinct doc_ids) to lift the
        // expression cost above the scheduling floor.
        val amp = sys.env.getOrElse("PROBE_AMP", "8").toInt
        val big = docs
          .select(col("doc_id"), col("text"),
            explode(sequence(lit(0), lit(amp - 1))).as("rep"))
          .select((col("doc_id") * amp + col("rep")).as("doc_id"), col("text"))
        def tok = graft.text.TextStats.tokens(
          graft.text.TextStats.normalize(col("text")))
        def phash(c: org.apache.spark.sql.Column) =
          graft.text.Dedup.portableTokenHash(c)
        val shipped = big.select(col("doc_id"), tok.as("toks"))
          .where(size(col("toks")) >= 2)
          .select(col("doc_id"), col("toks"),
            explode(sequence(lit(0), size(col("toks")) - 2)).as("i"))
          .select(col("doc_id"),
            phash(element_at(col("toks"), col("i") + 1)).as("w1h"),
            phash(element_at(col("toks"), col("i") + 2)).as("w2h"))
        val prehashed = big.select(col("doc_id"),
            transform(tok, t => phash(t)).as("hs"))
          .where(size(col("hs")) >= 2)
          .select(col("doc_id"), col("hs"),
            explode(sequence(lit(0), size(col("hs")) - 2)).as("i"))
          .select(col("doc_id"),
            element_at(col("hs"), col("i") + 1).as("w1h"),
            element_at(col("hs"), col("i") + 2).as("w2h"))
        for (it <- 1 to 3) {
          time(s"pairedEvents/shipped#$it") {
            shipped.write.format("noop").mode("overwrite").save()
          }
          time(s"pairedEvents/prehashed#$it") {
            prehashed.write.format("noop").mode("overwrite").save()
          }
        }

      case "tok" =>
        // Cross-cutting tokenize cost: split(trim(x), "\\s+") compiles the
        // regex PER ROW (UTF8String.split -> String.split -> Pattern.compile;
        // no fast path for multi-char patterns), where split on a literal
        // single space hits java.lang.String.split's no-regex fast path.
        // On NORMALIZED text (runs collapsed to single spaces) the two are
        // exact-identical. AMP as above.
        val amp2 = sys.env.getOrElse("PROBE_AMP", "8").toInt
        val big2 = docs
          .select(col("doc_id"), col("text"),
            explode(sequence(lit(0), lit(amp2 - 1))).as("rep"))
          .select((col("doc_id") * amp2 + col("rep")).as("doc_id"), col("text"))
        val norm = graft.text.TextStats.normalize(col("text"))
        val regexToks = when(length(trim(norm)) === 0,
          array().cast("array<string>")).otherwise(split(trim(norm), "\\s+"))
        val spaceToks = when(length(trim(norm)) === 0,
          array().cast("array<string>")).otherwise(split(trim(norm), " "))
        val a = big2.select(col("doc_id"), explode(regexToks).as("t"))
        val b = big2.select(col("doc_id"), explode(spaceToks).as("t"))
        for (it <- 1 to 3) {
          time(s"tokens/regex#$it") {
            a.write.format("noop").mode("overwrite").save()
          }
          time(s"tokens/space#$it") {
            b.write.format("noop").mode("overwrite").save()
          }
        }
        // equality gate: the two spellings must agree row-for-row
        val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
        println(s"PROBE tokens diff rows = $diff (must be 0)")

      case other => println(s"unknown PROBE_SECTION $other")
    }
    spark.stop()
  }
}
