package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CCNet-style word-level language-model quality scoring (Wenzek et al.,
  * arXiv:1911.00359): train an n-gram LM on a trusted in-domain slice
  * (CCNet uses Wikipedia; here any `isTrain` predicate over the corpus),
  * score every OTHER document by its average negative log-likelihood under
  * that model, and split the scored pool into head / middle / tail quality
  * tiers — the classic "keep the fluent third" pre-training filter.
  *
  * The model is a Stupid-Backoff bigram LM (Brants et al. 2007, "Large
  * Language Models in Machine Translation"): no normalization pass, just
  *   S(w2|w1) = c(w1 w2) / c(w1)                  when the bigram was seen,
  *            = 0.4 * (c(w2)+1) / (N+V)           backoff to the smoothed
  *                                                unigram otherwise,
  * which is exactly the score family built for corpus-scale counting —
  * the model IS two count tables, trainable in one aggregation pass.
  *
  * Engine-portable and EXACT (the q165/q190 integer discipline): every
  * log-probability is quantized ONCE to integer micronats (ln formed on
  * identical IEEE doubles in any engine, products formed in doubles so
  * trillion-token counts cannot wrap int64), and a document's score is then
  * an exact long SUM of micronats — order-independent, hash-replayable in
  * SQL. Tokens are keyed by the md5-based [[Dedup.portableTokenHash]] so
  * the count tables join on 64-bit longs, not strings, on any engine.
  *
  * Scale shape: ONE tokenize pass over the corpus (persisted in the
  * SHARED-SUBTREE mode of the [[graft.ops.Caching]] contract: the returned
  * frame is NOT the cache entry, so callers reclaim it with
  * [[graft.ops.Caching.releaseAll]] / `spark.catalog.clearCache()` after
  * the result's actions, as the harnesses do); the bigram/unigram model
  * tables are bounded by the TRAIN slice's
  * vocabulary and join the scoring stream as ordinary shuffled equi-joins
  * on 64-bit keys (nothing document-sized is broadcast); the (N, V) totals
  * collapse to driver-side literals via one bounded aggregate head — the
  * same job that fail-fasts on a degenerate train slice.
  */
object LangModel {

  /** Stupid-Backoff discount (Brants et al. 2007 §5.1's alpha). */
  private val Alpha = 0.4

  private def micronats(x: Column): Column =
    floor(log(x) * lit(1000000.0) + lit(0.5)).cast("long")

  /** Per-doc adjacent (w1h, w2h) hashed bigram events via the positional
    * explode ([[TextStats.gramStream]]'s codegen rationale); docs with <2
    * tokens emit none.
    *
    * The token array is hashed ONCE (a `transform` over the tokens) and the
    * bigram rows read the hashed longs positionally — the shipped spelling
    * used to hash per EVENT SIDE, i.e. every interior token paid the md5 +
    * hex-substring + base-16 parse twice (once as w1 of event i, once as w2
    * of event i−1). Although the higher-order transform runs interpreted
    * (HOF lambdas fall out of whole-stage codegen), halving the md5
    * evaluations wins decisively: BenchProbe `lmhash` (16× amplified corpus,
    * ~4.2 M events, noop sink, min-of-3) measured 8.2–8.5 s shipped vs
    * 5.2–5.9 s prehashed (−35%). Hash VALUES are identical (same md5 of the
    * same token strings), so model tables, scores, and every oracle replay
    * are unchanged. */
  private def pairedEvents(docs: DataFrame): DataFrame = {
    val toks = TextStats.tokens(TextStats.normalize(col("text")))
    // the <2-token filter runs on the UN-hashed token array: filtering on
    // size(hs) pushes the whole hashing transform into the Filter node and
    // every doc pays the md5 pass twice (plan-checked in plans/r16)
    docs.select(col("doc_id"), toks.as("toks"))
      .where(size(col("toks")) >= 2)
      .select(col("doc_id"),
        transform(col("toks"), t => Dedup.portableTokenHash(t)).as("hs"))
      .select(col("doc_id"), col("hs"),
        explode(sequence(lit(0), size(col("hs")) - 2)).as("i"))
      .select(col("doc_id"),
        element_at(col("hs"), col("i") + 1).as("w1h"),
        element_at(col("hs"), col("i") + 2).as("w2h"))
  }

  /** A trained Stupid-Backoff bigram LM as DATA: the bigram and unigram
    * log-prob tables (integer micronats) plus the unknown-token default —
    * the deployable form of [[lmScore]]'s model, persistable to a lake
    * table and servable against any stream or batch without retraining.
    * Both tables are bounded by the TRAIN slice's vocabulary. */
  final case class LmModel(bigram: DataFrame, unigram: DataFrame,
                           unkMicronats: Long)

  /** Train the model on the rows matching `isTrain` — the same count
    * arithmetic as [[lmScore]]'s in-line model (one aggregation pass; the
    * 1-row totals collapse to driver-side constants, so the unigram table
    * carries literal totals and serving needs NO scalar join). */
  def trainLm(docs: DataFrame, isTrain: Column): LmModel = {
    val paired = pairedEvents(docs.filter(isTrain))
    // fail fast with a diagnosable message: an empty slice (or one of only
    // <2-token docs) has no bigram events, and the totals head() below
    // would otherwise NPE on a null sum
    require(!paired.isEmpty,
      "trainLm: the isTrain slice produced no bigram events " +
        "(empty slice, or every training doc has < 2 tokens)")
    val c2 = paired.groupBy("w1h", "w2h").agg(count(lit(1)).as("c2"))
    val c1 = paired.groupBy("w1h").agg(count(lit(1)).as("c1"))
    val bigram = c2.join(c1, "w1h")
      .select(col("w1h"), col("w2h"),
        micronats(col("c2").cast("double") / col("c1").cast("double")).as("lp2"))
    val cu = paired.groupBy(col("w2h").as("wh")).agg(count(lit(1)).as("cu"))
    val totRow = cu.agg(sum("cu").as("nn"), count(lit(1)).as("vv")).head()
    val nv = totRow.getLong(0) + totRow.getLong(1)
    // same double-formed ratios and Math.log as the Column spelling, so
    // values are bit-identical to lmScore's in-line model
    val unigram = cu.select(col("wh"),
      micronats(lit(Alpha) * (col("cu") + lit(1L)).cast("double") /
        lit(nv.toDouble)).as("lp_bo"))
    val unk = math.floor(math.log(Alpha / nv.toDouble) * 1e6 + 0.5).toLong
    LmModel(bigram, unigram, unk)
  }

  /** Score documents against a (possibly lake-loaded) model: the serving
    * path — bigram lookup, unigram backoff, unknown default, exact long
    * sums; no training-side state beyond the two model tables. Returns the
    * same schema as [[lmScore]]. */
  def scoreWithLm(model: LmModel, docs: DataFrame): DataFrame =
    pairedEvents(docs)
      .join(model.bigram, Seq("w1h", "w2h"), "left")
      .join(model.unigram.withColumnRenamed("wh", "w2h"), Seq("w2h"), "left")
      .select(col("doc_id"),
        coalesce(col("lp2"), col("lp_bo"), lit(model.unkMicronats)).as("lp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), (-sum(col("lp"))).as("nll_micronats"))
      .select(col("doc_id"), col("n_bigrams"), col("nll_micronats"),
        floor(col("nll_micronats").cast("double") /
          col("n_bigrams").cast("double") + lit(0.5)).cast("long")
          .as("avg_nll_micronats"))

  /** Persist a model into the lake as three versioned tables
    * (`{prefix}_lm_bigram`, `{prefix}_lm_unigram`, `{prefix}_lm_meta`) —
    * the LM sibling of the ANN index save/load lifecycle. */
  def saveLm(lake: graft.tables.LakeTable, prefix: String,
             model: LmModel): Unit = {
    lake.write(model.bigram, s"${prefix}_lm_bigram", "overwrite"): Unit
    lake.write(model.unigram, s"${prefix}_lm_unigram", "overwrite"): Unit
    val spark = model.bigram.sparkSession
    import spark.implicits._
    lake.write(Seq(model.unkMicronats).toDF("unk_micronats"),
      s"${prefix}_lm_meta", "overwrite"): Unit
  }

  /** Load a persisted model; the 1-row meta read is the only collect. */
  def loadLm(lake: graft.tables.LakeTable, prefix: String): LmModel =
    LmModel(
      lake.read(s"${prefix}_lm_bigram"),
      lake.read(s"${prefix}_lm_unigram"),
      lake.read(s"${prefix}_lm_meta").head().getLong(0))

  /** Score every non-train document under the bigram LM trained on the
    * `isTrain` slice. Returns one row per scored document that has at least
    * one bigram (docs with <2 tokens have no bigram events and drop out):
    * (doc_id, n_bigrams, nll_micronats, avg_nll_micronats) where
    * nll_micronats = −Σ log-prob in integer micronats (exact long sum) and
    * avg_nll_micronats = round(nll/n) (one double division on exactly
    * representable longs — identical in any IEEE engine). Lower = more
    * fluent under the trusted slice's language model. */
  def lmScore(docs: DataFrame, isTrain: Column): DataFrame = {
    val toks = TextStats.tokens(TextStats.normalize(col("text")))
    // one tokenize pass: per-doc adjacent (w1, w2) pairs via a POSITIONAL
    // explode ([[TextStats.gramStream]]'s codegen rationale — exploding a
    // computed array falls out of whole-stage codegen), no join, no UDF.
    // Tokens are md5-hashed ONCE per position, not once per event side —
    // see [[pairedEvents]]'s probe numbers (−35% on the event pass).
    val paired = docs
      .select(col("doc_id"), isTrain.as("is_train"), toks.as("toks"))
      .where(size(col("toks")) >= 2) // filter the UN-hashed array — see pairedEvents
      .select(col("doc_id"), col("is_train"),
        transform(col("toks"), t => Dedup.portableTokenHash(t)).as("hs"))
      .select(col("doc_id"), col("is_train"), col("hs"),
        explode(sequence(lit(0), size(col("hs")) - 2)).as("i"))
      .select(col("doc_id"), col("is_train"),
        element_at(col("hs"), col("i") + 1).as("w1h"),
        element_at(col("hs"), col("i") + 2).as("w2h"))
      .persist()

    val train = paired.filter(col("is_train"))
    // bigram counts c(w1 w2) and LEFT-context counts c(w1) from the same
    // bigram stream (so the conditional S(w2|w1) = c2/c1 is a true
    // probability over observed contexts; the final token of each doc never
    // opens a context, matching the event stream being scored)
    val c2 = train.groupBy("w1h", "w2h").agg(count(lit(1)).as("c2"))
    val c1 = train.groupBy("w1h").agg(count(lit(1)).as("c1"))
    val model2 = c2.join(c1, "w1h")
      .select(col("w1h"), col("w2h"),
        micronats(col("c2").cast("double") / col("c1").cast("double")).as("lp2"))
    // unigram backoff over RIGHT tokens (the predicted position), Laplace-
    // smoothed so unseen words keep a finite score. ONE bounded totals job
    // over the persisted bigram stream serves both the degenerate-input
    // fail-fast (trainLm's contract: an empty train slice must throw, not
    // silently NULL every score) and the (N, V) scalar — which then rides
    // the backoff expressions as LITERALS (the classifierScore spelling)
    // instead of two broadcast cross joins plus an isEmpty probe job.
    val cu = train.groupBy(col("w2h").as("wh")).agg(count(lit(1)).as("cu"))
    val totRow = cu
      .agg(coalesce(sum("cu"), lit(0L)), count(lit(1))).head()
    val (nn, vv) = (totRow.getLong(0), totRow.getLong(1))
    require(nn > 0L,
      "lmScore: the isTrain slice produced no bigram events " +
        "(empty slice, or every training doc has < 2 tokens)")
    val denom = lit((nn + vv).toDouble)
    val uni = cu.select(col("wh"),
      micronats(lit(Alpha) * (col("cu") + lit(1L)).cast("double") / denom)
        .as("lp1"))

    val scored = paired.filter(!col("is_train"))
      .join(model2, Seq("w1h", "w2h"), "left")
      .join(uni.withColumnRenamed("wh", "w2h").withColumnRenamed("lp1", "lp_bo"),
        Seq("w2h"), "left")
      .select(col("doc_id"),
        coalesce(col("lp2"), col("lp_bo"),
          micronats(lit(Alpha) / denom)).as("lp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), (-sum(col("lp"))).as("nll_micronats"))
      .select(col("doc_id"), col("n_bigrams"), col("nll_micronats"),
        floor(col("nll_micronats").cast("double") /
          col("n_bigrams").cast("double") + lit(0.5)).cast("long")
          .as("avg_nll_micronats"))
    scored
  }

  /** CCNet's head/middle/tail split composed on [[lmScore]]: rank the
    * scored pool by (avg_nll_micronats, doc_id) ascending — most fluent
    * first — and label the first ceil(headPermille/1000 · n) docs "head",
    * the last ceil(tailPermille/1000 · n) "tail", the rest "middle".
    * Fractions are integer per-mille so the cutoffs are exact long
    * arithmetic (ceil(n·p/1000) = (n·p + 999) div 1000), replayable in SQL.
    *
    * Scale shape: the global rank comes from
    * [[graft.ops.Analytics.globalPrefixSums]] over avg-nll range buckets
    * (`bucketMicronats` wide), NOT a single-partition global window — the
    * only unpartitioned window runs over one row per occupied bucket. */
  def perplexityBuckets(docs: DataFrame, isTrain: Column,
      headPermille: Int = 300, tailPermille: Int = 300,
      bucketMicronats: Long = 100000L): DataFrame = {
    val scored = lmScore(docs, isTrain)
    val ranked = graft.ops.Analytics.globalPrefixSums(
      scored,
      floor(col("avg_nll_micronats").cast("double") / lit(bucketMicronats.toDouble))
        .cast("long"),
      Seq(col("avg_nll_micronats"), col("doc_id")),
      Seq("one" -> lit(1L)))
    val n = col("total_one")
    val headN = floor((n * lit(headPermille.toLong) + lit(999L)) / lit(1000L))
      .cast("long")
    val tailN = floor((n * lit(tailPermille.toLong) + lit(999L)) / lit(1000L))
      .cast("long")
    val out = ranked.select(col("doc_id"), col("n_bigrams"),
      col("avg_nll_micronats"), col("cum_one").as("rank"),
      when(col("cum_one") <= headN, lit("head"))
        .when(col("cum_one") > n - tailN, lit("tail"))
        .otherwise(lit("middle")).as("bucket"))
    out
  }

  /** Calibrate a STREAMING admission threshold from the batch tiering
    * contract: run [[perplexityBuckets]]' tail split over a representative
    * batch and return the largest avg_nll_micronats that stayed OUT of the
    * tail — the fixed `maxAvgNllMicronats` a
    * [[graft.stream.CorpusIngest.LmGate]] needs, derived from the batch
    * pipeline instead of hand-picked. Closes the batch → stream loop: a
    * gate at this threshold admits a held-out document iff the calibration
    * batch's refinery would have ranked it outside the tail.
    *
    * Tie caveat (documented, not hidden): the batch split breaks
    * equal-score ties by doc_id, which no fixed threshold can replay — the
    * returned threshold admits EVERY document at the boundary score. With
    * micronat-quantized scores a tie at the exact boundary requires two
    * docs with identical average nll; calibrate on a batch without one
    * (or accept the ≤-boundary contract, the safe side for a gate).
    *
    * One tiering pass + a 1-row max aggregate; nothing data-sized ever
    * reaches the driver. */
  def calibrateLmGate(docs: DataFrame, isTrain: Column,
      tailPermille: Int = 300, bucketMicronats: Long = 100000L): Long = {
    val tiers = perplexityBuckets(docs, isTrain, headPermille = 0,
      tailPermille = tailPermille, bucketMicronats = bucketMicronats)
    val row = tiers.filter(col("bucket") =!= "tail")
      .agg(max("avg_nll_micronats")).head()
    require(!row.isNullAt(0),
      "calibrateLmGate: every scored document fell in the tail tier — " +
        "lower tailPermille or enlarge the calibration batch")
    row.getLong(0)
  }
}
