package graft

import org.apache.spark.sql.functions._

import graft.text.{LangModel, TextFeatures}

/** Specs for the CCNet LM quality scorer, the head/middle/tail split, the
  * token-budget waterfilling allocation, and per-source quality selection. */
class LangModelSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def docs = graft.tables.Tables.load(spark, sf, "documents")

  // ---------------------------------------------------------------- lmScore

  test("lmScore: a verbatim train copy scores more fluent than a shuffled one") {
    import spark.implicits._
    // train = two fluent docs; score one verbatim restatement (all bigrams
    // seen) vs one with the same UNIGRAMS in scrambled order (every bigram
    // backs off) — the LM must rank the in-domain doc far lower in nll
    val d = Seq(
      (1L, "the cat sat on the mat", true),
      (2L, "the dog sat on the mat", true),
      (3L, "the cat sat on the mat", false),
      (4L, "mat the on sat cat the", false))
      .toDF("doc_id", "text", "is_train")
    val s = LangModel.lmScore(d, col("is_train"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("avg_nll_micronats")).toMap
    assert(s.keySet === Set(3L, 4L))
    assert(s(3L) < s(4L))
  }

  test("lmScore: unseen words fall through to the unknown default, still finite") {
    import spark.implicits._
    val d = Seq(
      (1L, "alpha beta gamma delta", true),
      (2L, "zz yy xx ww vv", false))
      .toDF("doc_id", "text", "is_train")
    val r = LangModel.lmScore(d, col("is_train")).collect()
    assert(r.length === 1)
    // 4 scoring events (5 tokens), every one the unknown default: the
    // unigram model counts PREDICTED (w2) positions, so the train doc's 4
    // tokens contribute N = 3 events over V = 3 distinct words, and the
    // default is ln(0.4 / (N + V)) = ln(0.4 / 6) in micronats
    val unk = math.floor(math.log(0.4 / 6.0) * 1e6 + 0.5).toLong
    assert(r.head.getAs[Long]("n_bigrams") === 4L)
    assert(r.head.getAs[Long]("nll_micronats") === -4L * unk)
  }

  test("lmScore: docs with fewer than two tokens drop out of the scored pool") {
    import spark.implicits._
    val d = Seq((1L, "a b c", true), (2L, "one", false), (3L, "a b", false))
      .toDF("doc_id", "text", "is_train")
    val ids = LangModel.lmScore(d, col("is_train"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids === Set(3L))
  }

  // ------------------------------------------------ trainLm / scoreWithLm

  test("scoreWithLm(trainLm) equals the in-line lmScore row-for-row") {
    val d = docs
    val inline = LangModel.lmScore(d, col("lang") === "en")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val served = LangModel.scoreWithLm(
        LangModel.trainLm(d, col("lang") === "en"),
        d.filter(col("lang") =!= "en"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(served === inline)
  }

  test("LM save/load roundtrip scores identically to the in-memory model") {
    val d = docs
    val m = LangModel.trainLm(d, col("lang") === "en")
    val dir = java.nio.file.Files.createTempDirectory("lm_spec_lake").toString
    val lake = new graft.tables.LakeTable(spark, dir)
    LangModel.saveLm(lake, "m", m)
    val loaded = LangModel.loadLm(lake, "m")
    assert(loaded.unkMicronats === m.unkMicronats)
    val direct = LangModel.scoreWithLm(m, d.filter(col("lang") =!= "en"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val roundtrip = LangModel.scoreWithLm(loaded, d.filter(col("lang") =!= "en"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(roundtrip === direct)
  }

  // ---------------------------------------------------- perplexityBuckets

  test("perplexityBuckets: exact per-mille tier sizes and rank-contiguous tiers") {
    val b = LangModel.perplexityBuckets(docs, col("lang") === "en",
      headPermille = 300, tailPermille = 300).persist()
    val n = b.count()
    val headN = (n * 300 + 999) / 1000
    val byBucket = b.groupBy("bucket").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byBucket("head") === headN)
    assert(byBucket("tail") === headN)
    assert(byBucket("middle") === n - 2 * headN)
    // tiers are contiguous in rank: max(head rank) < min(middle) <= max(middle) < min(tail)
    val maxHead = b.filter(col("bucket") === "head").agg(max("rank")).head.getLong(0)
    val minTail = b.filter(col("bucket") === "tail").agg(min("rank")).head.getLong(0)
    assert(maxHead === headN)
    assert(minTail === n - headN + 1)
    b.unpersist()
  }

  // ------------------------------------------------- tokenBudgetAllocation

  test("tokenBudgetAllocation: allocations waterfill exactly to the budget") {
    import spark.implicits._
    val d = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10", "small"),   // 10 tokens, cap 20
      (2L, ("x " * 100).trim, "big"),                      // 100 tokens, cap 200
      (3L, ("y " * 50).trim, "mid"))                       // 50 tokens, cap 100
      .toDF("doc_id", "text", "source")
    // budget 80 with caps (20, 100, 200): row1 infeasible (0+3*20=60 < 80),
    // row2 feasible: theta = (80-20)/2 = 30 -> alloc (20, 30, 30)
    val a = TextFeatures.tokenBudgetAllocation(d, budgetTokens = 80L, maxEpochs = 2.0)
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("alloc_tokens"), r.getAs[Boolean]("budget_met")))).toMap
    assert(a("small") === ((20L, true)))
    assert(a("mid") === ((30L, true)))
    assert(a("big") === ((30L, true)))
  }

  test("tokenBudgetAllocation: unreachable budget allocates every cap, budget_met false") {
    import spark.implicits._
    val d = Seq((1L, "a b c d", "s1"), (2L, "e f g h i j", "s2"))
      .toDF("doc_id", "text", "source")
    val a = TextFeatures.tokenBudgetAllocation(d, budgetTokens = 1000L, maxEpochs = 2.0)
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("alloc_tokens"), r.getAs[Long]("cap_tokens"),
          r.getAs[Boolean]("budget_met")))).toMap
    assert(a("s1") === ((8L, 8L, false)))
    assert(a("s2") === ((12L, 12L, false)))
  }

  test("tokenBudgetAllocation: epochs never exceed the cap in micro-epochs") {
    val a = TextFeatures.tokenBudgetAllocation(docs, budgetTokens = 4000L,
      maxEpochs = 2.0)
    val over = a.filter(col("epochs_micro") > lit(2000000L)).count()
    assert(over === 0L)
    // waterfill exactness: sum(alloc) within |sources| floor-loss of budget
    val row = a.agg(sum("alloc_tokens").as("s"), count(lit(1)).as("k")).head
    val (s, k) = (row.getLong(0), row.getLong(1))
    assert(s <= 4000L && s >= 4000L - k)
  }

  // ---------------------------------------------------- budgetedSamplePlan

  test("budgetedSamplePlan: per-source totals land in [alloc, alloc + max doc)") {
    val plan = TextFeatures.budgetedSamplePlan(docs, budgetTokens = 4000L,
      maxEpochs = 2.0).persist()
    val alloc = TextFeatures.tokenBudgetAllocation(docs, budgetTokens = 4000L,
      maxEpochs = 2.0)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("alloc_tokens")).toMap
    val totals = plan.groupBy("source")
      .agg(sum(col("n_copies") * col("n_tokens")).as("t"),
        max(col("n_tokens")).as("mx"), max(col("n_copies")).as("mc"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    totals.foreach { case (src, (t, mx, mc)) =>
      assert(t >= alloc(src) && t < alloc(src) + mx, s"source $src")
      assert(mc <= 2L, s"source $src copies")
    }
    plan.unpersist()
  }

  test("budget ops survive a source of only zero-token documents") {
    import spark.implicits._
    val d = Seq((1L, "a b c d e", "ok"), (2L, "", "empty"), (3L, "   ", "empty"))
      .toDF("doc_id", "text", "source")
    val alloc = TextFeatures.tokenBudgetAllocation(d, budgetTokens = 4L,
      maxEpochs = 2.0)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("alloc_tokens"), r.getAs[Long]("epochs_micro")))).toMap
    assert(alloc("empty") === ((0L, 0L)))
    assert(alloc("ok")._1 === 4L)
    val plan = TextFeatures.budgetedSamplePlan(d, budgetTokens = 4L,
      maxEpochs = 2.0)
      .collect().map(r => r.getLong(0)).toSet
    // the empty source vanishes from the plan; the real source is planned
    assert(plan === Set(1L))
  }

  test("zero-token docs: topQualityPerSource ranks them last, effectiveTokens reports 0 permille") {
    import spark.implicits._
    val d = Seq((1L, "a b c d e", "ok"), (2L, "", "empty"), (3L, "   ", "empty"))
      .toDF("doc_id", "text", "source")
    // no ANSI divide-by-zero; zero-token docs carry the sentinel key 0 and
    // therefore sort to the bottom of their source's quality ranking
    val tq = TextFeatures.topQualityPerSource(d, keepPermille = 1000).collect()
    val empties = tq.filter(_.getAs[String]("source") == "empty")
    assert(empties.length === 2)
    assert(empties.forall(_.getAs[Long]("distinct_micro") === 0L))
    // a source of only zero-token docs kept nothing it could count: 0‰
    val eff = graft.text.Dedup.effectiveTokens(d)
      .collect().map(r => r.getAs[String]("source") ->
        r.getAs[Long]("kept_permille")).toMap
    assert(eff("empty") === 0L)
    assert(eff("ok") === 1000L)
  }

  test("trainLm and lmScore fail fast when the train slice has no bigram events") {
    import spark.implicits._
    val d = Seq((1L, "one", "x"), (2L, "a b c", "y"))
      .toDF("doc_id", "text", "source")
    val e1 = intercept[IllegalArgumentException](
      LangModel.trainLm(d, col("source") === "x"))
    assert(e1.getMessage.contains("no bigram events"))
    val e2 = intercept[IllegalArgumentException](
      LangModel.lmScore(d, col("source") === "x"))
    assert(e2.getMessage.contains("no bigram events"))
  }

  test("calibrateLmGate returns the non-tail boundary of the batch tiering") {
    val threshold = LangModel.calibrateLmGate(docs, col("lang") === "en",
      tailPermille = 300)
    val tiers = LangModel.perplexityBuckets(docs, col("lang") === "en",
      headPermille = 0, tailPermille = 300).persist()
    val maxKept = tiers.filter(col("bucket") =!= "tail")
      .agg(max("avg_nll_micronats")).head().getLong(0)
    val minTail = tiers.filter(col("bucket") === "tail")
      .agg(min("avg_nll_micronats")).head().getLong(0)
    assert(threshold === maxKept)
    // on this corpus the boundary is strict, so a <=-threshold gate admits
    // EXACTLY the batch split's non-tail docs
    assert(minTail > threshold)
    tiers.unpersist()
  }

  test("budgetedSamplePlan is deterministic under the seed") {
    def run() = TextFeatures.budgetedSamplePlan(docs, budgetTokens = 4000L,
      maxEpochs = 2.0)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("n_copies"))).toSet
    assert(run() === run())
  }

  // ---------------------------------------------- budgetedQualitySelection

  test("budgetedQualitySelection: per-source quality prefix filling the allocation") {
    val budget = 3000L
    val sel = TextFeatures.budgetedQualitySelection(docs, budget).persist()
    val alloc = TextFeatures.tokenBudgetAllocation(docs, budget, maxEpochs = 1.0)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("t_tokens"), r.getAs[Long]("alloc_tokens")))).toMap
    // selected totals land in [alloc, alloc + max doc) where the cut binds,
    // == t_tokens where it does not
    val totals = sel.groupBy("source")
      .agg(sum("n_tokens").as("t"), max("n_tokens").as("mx"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    totals.foreach { case (src, (t, mx)) =>
      val (full, a) = alloc(src)
      if (a < full) assert(t >= a && t < a + mx, s"source $src")
      else assert(t === full, s"source $src")
    }
    // the budget binds somewhere on this corpus
    assert(alloc.exists { case (_, (full, a)) => a < full })
    // prefix property: within each source the selected set is a PREFIX of
    // the quality order — no unselected doc outranks a selected one
    val all = TextFeatures.topQualityPerSource(docs, keepPermille = 1000)
    val unsel = all.join(sel.select("doc_id"), Seq("doc_id"), "left_anti")
    val worstSel = sel.groupBy("source")
      .agg(min(col("distinct_micro") * lit(1000000000L) + col("n_tokens")).as("ws"))
    val bestUnsel = unsel.groupBy("source")
      .agg(max(col("distinct_micro") * lit(1000000000L) + col("n_tokens")).as("bu"))
    val bad = worstSel.join(bestUnsel, "source")
      .filter(col("bu") > col("ws")).count()
    assert(bad === 0L)
    sel.unpersist()
  }

  // --------------------------------------------------- topQualityPerSource

  test("topQualityPerSource: every source keeps exactly ceil(30%) of its docs") {
    val perSrc = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = TextFeatures.topQualityPerSource(docs, keepPermille = 300)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.keySet === perSrc.keySet)
    kept.foreach { case (src, n) =>
      assert(n === (perSrc(src) * 300 + 999) / 1000, s"source $src")
    }
  }

  test("topQualityPerSource: kept docs dominate dropped ones on the quality key") {
    // within each source, the worst kept (distinct_micro, n_tokens, -doc_id)
    // key must be >= the best dropped key — the selection is a true top-k
    val all = TextFeatures.topQualityPerSource(docs, keepPermille = 1000)
    val kept = TextFeatures.topQualityPerSource(docs, keepPermille = 300)
    val dropped = all.join(kept.select("doc_id"), Seq("doc_id"), "left_anti")
    val worstKept = kept.groupBy("source")
      .agg(min(col("distinct_micro") * lit(1000000L) + col("n_tokens")).as("wk"))
    val bestDropped = dropped.groupBy("source")
      .agg(max(col("distinct_micro") * lit(1000000L) + col("n_tokens")).as("bd"))
    val bad = worstKept.join(bestDropped, "source")
      .filter(col("bd") > col("wk")).count()
    assert(bad === 0L)
  }
}
