package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text vectorization: TF-IDF document embeddings via the hashing trick —
  * turns the `documents` table into an `(doc_id, embedding)` corpus usable by
  * every [[graft.sim.Similarity]] operator (brute force / LSH / IVF). All
  * spark.ml transformers, so the pipeline is a pure map after one IDF
  * aggregate over the corpus.
  */
object TextFeatures {

  /** (doc_id, embedding: array<float>) TF-IDF vectors, L2-normalized so dot
    * product == cosine. `numFeatures` is the hashing-trick width. */
  def tfidfEmbeddings(docs: DataFrame, numFeatures: Int = 1 << 12): DataFrame = {
    import org.apache.spark.ml.feature.{HashingTF, IDF, Normalizer}
    import org.apache.spark.ml.functions.vector_to_array
    val toks = docs.select(col("doc_id"),
      TextStats.tokens(TextStats.normalize(col("text"))).as("toks"))
    val tf = new HashingTF().setInputCol("toks").setOutputCol("tf")
      .setNumFeatures(numFeatures).transform(toks)
    val idf = new IDF().setInputCol("tf").setOutputCol("tfidf").fit(tf)
    val normed = new Normalizer().setInputCol("tfidf").setOutputCol("norm").setP(2.0)
      .transform(idf.transform(tf))
    normed.select(col("doc_id").as("vec_id"),
      vector_to_array(col("norm"), "float32").as("embedding"))
  }

  /** Engine-portable TF-IDF embeddings: the same hashing-trick pipeline as
    * [[tfidfEmbeddings]], but every engine-specific ingredient replaced by a
    * portable one — feature index is [[Dedup.portableTokenHash]] mod
    * `numFeatures` (not spark.ml's murmur3), IDF = ln((m+1)/(df+1)) rounded
    * by the floor trick at 6 dp (so a 1-ulp libm `ln` difference between
    * engines cannot change a weight), and vectors stay unnormalized doubles
    * (cosine normalizes anyway). Any SQL engine can rebuild these vectors
    * bit-for-bit — the q44 oracle does. Plan shape: one token explode, two
    * map-combined aggregates (tf, df), a broadcast of the |features|-sized
    * df table, dense assembly per doc. Zero UDFs. */
  def tfidfEmbeddingsPortable(docs: DataFrame, numFeatures: Int = 256): DataFrame = {
    // The tokenize + md5-hash explode feeds BOTH the tf branch (shuffle on
    // (doc_id, feat)) and the df branch (shuffle on feat) — different keys,
    // so unpersisted the corpus tokenizes twice. r12 (suite of 259)
    // measured recompute 3.58 s vs persist 3.92 s and shipped the double
    // tokenize; RE-MEASURED at the r14 suite size (sf0.1 isolation, warm
    // q43-family predecessor, CPUS=32, three iterations each): recompute
    // min 2.82 / worst-warm 3.45 / cold 6.27 s vs PERSISTED 2.70 / 3.04 /
    // 3.04 s — the persist now wins on every axis, and more importantly
    // removes the contention sensitivity behind q44's bouncing driver
    // readings (3.37 → 5.07 s across rounds on unchanged code: the second
    // normalize+tokenize pass doubles the CPU-heavy span that slows under
    // machine load, where the cached (doc_id, feat) rows do not). The
    // persist is INTERMEDIATE and released in-function (the bandedNearDups
    // lifecycle): the result materializes eagerly via localCheckpoint —
    // doc-grain, far smaller than the (doc × token) explode — so repeated
    // library calls leak nothing; the returned frame is bound to its own
    // blocks and [[graft.ops.Caching.release]] reclaims it.
    val tok = docs.select(col("doc_id"),
        explode(TextStats.tokens(TextStats.normalize(col("text")))).as("tok"))
      .select(col("doc_id"),
        pmod(Dedup.portableTokenHash(col("tok")), lit(numFeatures.toLong))
          .cast("int").as("feat"))
      .persist()
    try {
      val tf = tok.groupBy("doc_id", "feat").agg(count(lit(1)).as("tf"))
      val dft = tok.distinct().groupBy("feat").agg(count(lit(1)).as("df"))
      val m = docs.agg(count(lit(1)).as("m"))
      val idf = floor(log((col("m") + 1).cast("double") /
        (col("df") + 1).cast("double")) * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
      val w = tf.join(broadcast(dft), "feat").crossJoin(broadcast(m))
        .select(col("doc_id"), col("feat"),
          (col("tf").cast("double") * idf).as("w"))
      w.groupBy("doc_id")
        .agg(map_from_entries(collect_list(struct(col("feat"), col("w")))).as("mp"))
        .select(col("doc_id").as("vec_id"),
          transform(sequence(lit(0), lit(numFeatures - 1)),
            i => coalesce(element_at(col("mp"), i), lit(0.0))).as("embedding"))
        .localCheckpoint(true)
    } finally graft.ops.Caching.release(tok)
  }

  /** Deterministic stratified sample: per-stratum fractions, seeded. */
  def stratifiedSample(df: DataFrame, stratumCol: String,
                       fractions: Map[String, Double], seed: Long = 42L): DataFrame =
    df.stat.sampleBy(stratumCol, fractions, seed)

  /** Seeded train/validation/test split for pipeline reproducibility. */
  def trainValTest(df: DataFrame, weights: Array[Double] = Array(0.8, 0.1, 0.1),
                   seed: Long = 42L): Array[DataFrame] =
    df.randomSplit(weights, seed)

  /** Fixed-size context-window chunking with stride: one output row per
    * (document, chunk) where chunk `i` covers tokens
    * `[i*stride, i*stride + chunk)`. Chunk starts come from a `sequence` +
    * `explode` over the token COUNT — the token array itself is never
    * duplicated per chunk, so the generator output stays narrow. Pure map +
    * generate, zero shuffles; `chunk >= stride` gives overlapping windows.
    * Division is double-then-truncate, exact for non-negative counts. */
  def chunkPlan(docs: DataFrame, chunk: Int = 128, stride: Int = 96): DataFrame = {
    require(chunk >= 1 && stride >= 1, "chunk and stride must be positive")
    val toks = docs.select(col("doc_id"),
      size(TextStats.tokens(TextStats.normalize(col("text")))).as("n_tokens"))
    toks.filter(col("n_tokens") >= 1)
      .select(col("doc_id"), col("n_tokens"),
        explode(sequence(lit(0),
          ((col("n_tokens") - 1) / lit(stride)).cast("int"))).as("chunk_idx"))
      .select(col("doc_id"), col("n_tokens"), col("chunk_idx"),
        (col("chunk_idx") * stride).as("start_tok"),
        least(lit(chunk), col("n_tokens") - col("chunk_idx") * stride)
          .as("chunk_len"))
  }

  /** Per-source document cap — the source-balancing step of a data-mixing
    * recipe: keep at most `k` documents per corpus source, chosen by
    * DETERMINISTIC hash order (md5 of the id, id tiebreak) so the sample is
    * reproducible across engines, partitionings, and reruns — none of which
    * hold for `TABLESAMPLE`/`df.sample`. One shuffle on source; Spark plans
    * the rank-filter as WindowGroupLimit, so only k rows per source survive
    * the sort on each side of the exchange. */
  def perSourceCap(docs: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "cap must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    docs.select(col("doc_id"), col("source"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("doc_id"), col("source"), col("rn").as("sample_rank"))
  }

  /** Source upsampling — the other half of a data-mixing recipe: repeat each
    * document `weights(source)` times (default 1), tagging copies with
    * `copy_idx`, so downstream packing/shuffling sees the target mixture.
    * `explode(sequence(...))` generates copies lazily — no shuffle and no
    * materialized duplication until a downstream sink asks for rows; weights
    * are a broadcast plan literal. */
  def sourceUpsample(docs: DataFrame, weights: Map[String, Int]): DataFrame = {
    require(weights.values.forall(_ >= 1), "weights must be >= 1")
    val w = weights.foldLeft(lit(1)) { case (acc, (src, n)) =>
      when(col("source") === src, lit(n)).otherwise(acc)
    }
    docs.select(col("doc_id"), col("source"),
        explode(sequence(lit(1), w)).as("copy_idx"))
  }

  /** Temperature-based mixture plan: sampling weights w_i proportional to
    * n_i^alpha (alpha < 1 flattens the source distribution toward uniform —
    * the standard multilingual/multi-corpus rebalancing move; alpha = 1 is
    * proportional, alpha = 0 uniform). Pure arithmetic over the
    * |sources|-row count table; weights round at 6 dp BEFORE the target
    * count derivation so every engine lands on identical integers. */
  def temperatureMixture(docs: DataFrame, alpha: Double = 0.7): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy()
    docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
      .select(col("source"), col("n_docs"),
        round(pow(col("n_docs").cast("double"), lit(alpha)) /
          sum(pow(col("n_docs").cast("double"), lit(alpha))).over(w), 6)
          .as("weight"),
        sum(col("n_docs")).over(w).as("total_docs"))
      .select(col("source"), col("n_docs"), col("weight"),
        floor(col("weight") * col("total_docs").cast("double") + lit(0.5))
          .cast("long").as("target_docs"))
  }

  /** Deterministic round-robin interleave of sources for training order:
    * within each source, docs take a hash-shuffled rank; the global epoch
    * position is then (rank-1)*|sources| + source_index — a pure FORMULA,
    * no global sort, so the plan stays one per-source window plus a
    * broadcast of the |sources|-row index map. Uneven sources leave gaps in
    * the position space, which still yields a valid total order while
    * guaranteeing consecutive positions cycle through sources. */
  def interleavePlan(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val srcIdx = docs.select(col("source")).distinct()
      .select(col("source"), row_number().over(
        Window.orderBy("source")).as("source_idx"))
    // |sources| rides along as a broadcast scalar cross join — the whole
    // plan stays lazy, one job, no driver round-trip
    val nSrc = srcIdx.agg(count(lit(1)).as("ns"))
    val ranked = docs.select(col("doc_id"), col("source"),
      row_number().over(Window.partitionBy("source")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))).as("rn"))
    ranked.join(broadcast(srcIdx), "source").crossJoin(broadcast(nSrc))
      .select(col("doc_id"), col("source"), col("rn"),
        ((col("rn") - 1) * col("ns") + col("source_idx") - 1).as("epoch_pos"))
  }

  /** Greedy token-stream packing: within each corpus `source`, documents in
    * doc_id order are laid head-to-tail into fixed-`capacity` training
    * sequences; a document whose span crosses a boundary reports
    * `start_bin != end_bin` (the packer's split-or-pad decision point).
    * One running-sum window PARTITIONED BY source — packing parallelizes
    * across sources, the way a 100 TB pipeline shards packing by corpus
    * rather than one global order. `capacity` a power of two keeps the
    * double division exact (counts < 2^53). */
  /** Weighted sample of `n` documents WITHOUT replacement via
    * Duffield–Lund–Thorup priority sampling: each row gets priority = w/u
    * with u uniform in (0,1], and the top-n priorities are the sample
    * (selection probability rises with weight; the scheme gives unbiased
    * Horvitz–Thompson subset-sum estimates). u derives from an md5 prefix of
    * the seeded key, so the sample is REPRODUCIBLE across engines, runs, and
    * partitionings — and priority needs one divide, no `ln`/`pow`, so the
    * ranking is bit-identical everywhere (a libm call could flip near-ties
    * between engines). Top-n plans as TakeOrderedAndProject: no global sort
    * materializes at scale. Non-positive weights are excluded. */
  def prioritySample(docs: DataFrame, n: Int, weightCol: String = "n_chars",
                     seed: String = "pr1"): DataFrame = {
    val h = conv(substring(md5(concat(lit(seed), col("doc_id").cast("string"))),
      1, 8), 16, 10).cast("long")
    val u = (h + 1).cast("double") / lit(4294967297.0) // (2^32+1): u in (0,1]
    docs.filter(col(weightCol) > 0)
      .withColumn("priority", col(weightCol).cast("double") / u)
      .orderBy(desc("priority"), asc("doc_id"))
      .limit(n)
      .select(col("doc_id"), col(weightCol).cast("long").as("weight"),
        col("priority"))
  }

  /** DSIR importance weights (Xie et al. 2023, arXiv:2302.03169 — Data
    * Selection via Importance Resampling): score each candidate document by
    * how much more likely its hashed n-gram bag is under the TARGET
    * distribution than under the RAW pool, log w(x) = Σ_b count_x(b) ·
    * (ln P_target(b) − ln P_raw(b)), with bag-of-buckets models
    * (Laplace-smoothed) over `buckets` hashed n-gram features — the
    * published recipe for "select web data that looks like my high-quality
    * target slice". Selection composes downstream: deterministic top-K by
    * (weight, doc_id), or [[prioritySample]] for the paper's stochastic
    * resampling.
    *
    * Engine-portable and EXACT: buckets hash with the md5-based
    * [[Dedup.portableTokenHash]] (swap xxhash64 in for a fast path), each
    * bucket's log-ratio is quantized ONCE to integer micronats (the q165
    * pattern — products formed in doubles, ln on identical IEEE inputs),
    * and every per-doc weight is then an exact long sum of
    * count × micronat — order-independent, hash-replayable in SQL.
    *
    * Scale shape: ONE corpus tokenize pass (persisted, Caching contract),
    * a `buckets`-sized model table broadcast back, and a map-side-combined
    * (doc, bucket) count aggregate — nothing document-sized is shuffled
    * twice, and the model table is bounded by `buckets` regardless of
    * corpus size. Returns (doc_id, n_grams, w_micronats) for every
    * NON-target document (the selection pool). */
  def dsirWeights(docs: DataFrame, isTarget: org.apache.spark.sql.Column,
                  n: Int = 2, buckets: Int = 1024): DataFrame = {
    // positional gram stream (TextStats.gramStream's codegen rationale);
    // multiplicity preserved — DSIR counts gram occurrences, not sets
    val grams = TextStats.gramStream(
        docs.select(col("doc_id"), col("text"), isTarget.as("is_target")),
        n, carryCols = Seq("is_target"))
      .select(col("doc_id"), col("is_target"),
        pmod(Dedup.portableTokenHash(col("gram")), lit(buckets.toLong)).as("b"))
      .persist()
    val stats = grams.groupBy("b").agg(
      sum(when(col("is_target"), 1L).otherwise(0L)).as("ct"),
      sum(when(!col("is_target"), 1L).otherwise(0L)).as("cr"))
    val totals = stats.agg(sum("ct").as("tt"), sum("cr").as("tr"))
    // per-bucket micronat log-ratio: ln of one double-formed ratio, floor-
    // quantized — int64 products of count × total would wrap at trillion-
    // token scale (q165's rule), so every product is formed in doubles
    val lr = stats.crossJoin(broadcast(totals)) // buckets-sized × 1 row
      .select(col("b"), floor(log(
          ((col("ct") + lit(1L)).cast("double") *
            (col("tr") + lit(buckets.toLong)).cast("double")) /
          ((col("cr") + lit(1L)).cast("double") *
            (col("tt") + lit(buckets.toLong)).cast("double")))
        * lit(1000000.0) + lit(0.5)).cast("long").as("lr"))
    grams.filter(!col("is_target"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("cnt"))
      .join(broadcast(lr), Seq("b"))
      .groupBy("doc_id")
      .agg(sum("cnt").as("n_grams"),
        sum(col("cnt") * col("lr")).as("w_micronats"))
  }

  /** DSIR RESAMPLING — the paper's actual data-selection step
    * (arXiv:2302.03169 §3) composed on [[dsirWeights]]: draw `keep`
    * documents from the raw pool with probability ∝ their importance
    * weight, WITHOUT replacement, via the Gumbel top-k identity
    * (argtop-k of log w(x_i) + g_i with g_i ~ Gumbel(0,1) is exactly a
    * weight-proportional sample without replacement — no exp(log w) ever
    * materializes, so huge positive/negative log weights can't overflow).
    *
    * Deterministic and engine-replayable: g_i = −ln(−ln u_i) with u_i from
    * the same seeded md5-prefix construction as [[prioritySample]]
    * (u ∈ (0,1) strictly, so the Gumbel is finite), floor-quantized ONCE to
    * integer micronats; the selection key is then the EXACT long sum
    * w_micronats + g_micronats ordered (key DESC, doc_id) — the same
    * integer-arithmetic discipline as the weights themselves, so the
    * selected set replays bit-for-bit in SQL. Top-`keep` plans as
    * TakeOrderedAndProject: no global sort materializes at scale, and the
    * only corpus-sized work is [[dsirWeights]]'s single tokenize pass. */
  def dsirResample(docs: DataFrame, isTarget: org.apache.spark.sql.Column,
                   keep: Int, n: Int = 2, buckets: Int = 1024,
                   seed: String = "dsir1"): DataFrame = {
    val h = conv(substring(md5(concat(lit(seed), col("doc_id").cast("string"))),
      1, 8), 16, 10).cast("long")
    val u = (h + 1).cast("double") / lit(4294967297.0)
    dsirWeights(docs, isTarget, n, buckets)
      .withColumn("g_micronats",
        floor(-log(-log(u)) * lit(1000000.0) + lit(0.5)).cast("long"))
      .withColumn("score_micronats", col("w_micronats") + col("g_micronats"))
      .orderBy(desc("score_micronats"), asc("doc_id"))
      .limit(keep)
      .select(col("doc_id"), col("n_grams"), col("w_micronats"),
        col("g_micronats"), col("score_micronats"))
  }

  /** Token-budget epoch allocation by exact waterfilling: given a total
    * training budget of `budgetTokens` and a repetition cap of `maxEpochs`
    * passes over any one source, find the unique water level θ with
    * Σ_s min(cap_s, θ) = budget (cap_s = maxEpochs · tokens_s) and allocate
    * alloc_s = min(cap_s, θ) tokens to each source — the standard "spread
    * the budget as evenly as sources allow" mixture schedule (the epoching
    * rule studied in arXiv:2305.16264, "Scaling Data-Constrained Language
    * Models": repeat small sources up to a cap, never beyond).
    *
    * Exact and engine-portable: sources sort by integer cap; θ comes from
    * the first row whose cap could hold the water level — algebraically,
    * θ = MAX over feasible rows of (budget − Σ caps below) / #rows-at-or-
    * above (one double division on exactly representable longs), a closed
    * form with no iteration. Allocations floor to whole tokens; epochs are
    * returned in integer micro-epochs. If even every cap summed cannot
    * reach the budget (θ null), every source allocates its full cap and
    * `budget_met` reports false.
    *
    * Scale shape: one tokenize pass map-side-combines to ONE ROW PER
    * SOURCE; every window after that runs on the |sources| grain (bounded,
    * PlanLint-whitelisted), so corpus size only affects the first pass. */
  def tokenBudgetAllocation(docs: DataFrame, budgetTokens: Long,
      maxEpochs: Double = 4.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perSource = docs
      .select(col("source"),
        size(TextStats.tokens(TextStats.normalize(col("text")))).cast("long")
          .as("n_tokens"))
      .groupBy("source").agg(sum("n_tokens").as("t_tokens"))
      .withColumn("cap_tokens",
        floor(col("t_tokens").cast("double") * lit(maxEpochs)).cast("long"))
    val w = Window.orderBy(col("cap_tokens"), col("source"))
    val ranked = perSource
      .withColumn("prefix_excl",
        coalesce(sum(col("cap_tokens")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("remaining",
        count(lit(1)).over(w.rowsBetween(Window.currentRow,
          Window.unboundedFollowing)))
    val theta = ranked
      .agg(max(when(
        col("prefix_excl") + col("remaining") * col("cap_tokens")
          >= lit(budgetTokens),
        (lit(budgetTokens) - col("prefix_excl")).cast("double") /
          col("remaining").cast("double"))).as("theta"))
    ranked.crossJoin(broadcast(theta))
      .select(col("source"), col("t_tokens"), col("cap_tokens"),
        least(col("cap_tokens"),
          floor(coalesce(col("theta"),
            col("cap_tokens").cast("double"))).cast("long"))
          .as("alloc_tokens"),
        col("theta").isNotNull.as("budget_met"))
      .withColumn("epochs_micro",
        // a source of only zero-token docs has t_tokens = 0 (and alloc 0);
        // the unguarded double division would floor(Infinity) and ANSI
        // mode rejects that cast — such a source trains nothing: 0 epochs
        when(col("t_tokens") > 0,
          floor(col("alloc_tokens").cast("double") * lit(1000000.0) /
            col("t_tokens").cast("double") + lit(0.5)).cast("long"))
          .otherwise(lit(0L)))
  }

  /** Materialize [[tokenBudgetAllocation]]'s waterfilled budget into the
    * per-document TRAINING PLAN (the arXiv:2305.16264 schedule made
    * concrete): every document of a source repeats floor(alloc/T) times
    * (whole epochs), and the fractional remainder epoch takes documents in
    * seeded md5 order until its token budget is covered — a doc is in the
    * partial epoch iff its preceding cumulative token count is still below
    * the remainder (the packing convention: start before the budget
    * exhausts). Output (doc_id, source, n_tokens, n_copies), rows with
    * zero copies dropped.
    *
    * Exact and engine-portable: whole epochs are integer division on
    * longs, the partial-epoch cut is a per-source running token sum over
    * the seeded md5 order (same construction as [[prioritySample]]'s u),
    * so the plan replays bit-for-bit in SQL. Per-source totals land in
    * [alloc, alloc + max doc) — spec-pinned.
    *
    * Scale shape: the allocation is |sources| rows and BROADCASTS back;
    * one window PARTITIONED BY source (no global sort); everything else
    * is a map. */
  def budgetedSamplePlan(docs: DataFrame, budgetTokens: Long,
      maxEpochs: Double = 4.0, seed: String = "budget1"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // a zero-token source would divide by zero in the epoch split (ANSI
    // rejects pmod by 0) and cannot contribute tokens anyway — drop it
    val alloc = tokenBudgetAllocation(docs, budgetTokens, maxEpochs)
      .filter(col("t_tokens") > 0)
      .select(col("source"), col("t_tokens"), col("alloc_tokens"))
    val perDoc = docs.select(col("doc_id"), col("source"),
      size(TextStats.tokens(TextStats.normalize(col("text")))).cast("long")
        .as("n_tokens"))
      .join(broadcast(alloc), Seq("source"))
      .withColumn("whole_epochs",
        graft.ops.Analytics.idiv(col("alloc_tokens"), col("t_tokens")))
      .withColumn("rem_tokens",
        col("alloc_tokens") - col("whole_epochs") * col("t_tokens"))
    val w = Window.partitionBy("source")
      .orderBy(md5(concat(lit(seed), col("doc_id").cast("string"))), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    perDoc
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("n_copies",
        col("whole_epochs") +
          when(col("cum_before") < col("rem_tokens"), lit(1L)).otherwise(lit(0L)))
      .filter(col("n_copies") > 0)
      .select(col("doc_id"), col("source"), col("n_tokens"), col("n_copies"))
  }

  /** Per-source quality selection (the per-domain form of DataComp-style
    * top-fraction filtering): rank each source's documents by a
    * deterministic quality key — micronat-quantized distinct-token ratio,
    * then token count, then doc_id — and keep the best
    * ceil(keepPermille/1000 · n_source) documents of EVERY source, so no
    * single domain's quality distribution starves another (the failure
    * mode of a global cutoff). Integer per-mille cutoffs and integer
    * ordering keys replay exactly on any engine.
    *
    * Scale shape: one map pass for the features, then a single window
    * PARTITIONED BY source — shuffles each source's rows once, no global
    * sort, no driver state. */
  /** The shared deterministic quality-key projection of
    * [[topQualityPerSource]] and [[budgetedQualitySelection]]: (doc_id,
    * source, n_tokens, distinct_micro). A zero-token (empty /
    * whitespace-only) doc would divide by zero — ANSI mode rejects it;
    * such docs carry the sentinel key 0 and rank last (the epochs_micro
    * guard in [[tokenBudgetAllocation]], applied to the quality key). */
  private def qualityFeatures(docs: DataFrame): DataFrame = {
    val toks = TextStats.tokens(TextStats.normalize(col("text")))
    docs.select(col("doc_id"), col("source"),
      size(toks).cast("long").as("n_tokens"),
      when(size(toks) > 0,
        floor(size(array_distinct(toks)).cast("double") * lit(1000000.0) /
          size(toks).cast("double") + lit(0.5)).cast("long"))
        .otherwise(lit(0L)).as("distinct_micro"))
  }

  def topQualityPerSource(docs: DataFrame, keepPermille: Int = 300): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val feats = qualityFeatures(docs)
    val w = Window.partitionBy("source")
      .orderBy(desc("distinct_micro"), desc("n_tokens"), asc("doc_id"))
    feats
      .withColumn("rnk", row_number().over(w))
      .withColumn("n_src", count(lit(1)).over(Window.partitionBy("source")))
      .where(col("rnk") * lit(1000L) <=
        col("n_src") * lit(keepPermille.toLong) + lit(999L))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("distinct_micro"), col("rnk").cast("long").as("rnk"))
  }

  /** Budgeted QUALITY selection — the curation endgame composing the two
    * halves this library already has: [[tokenBudgetAllocation]] decides how
    * many tokens each SOURCE contributes (waterfilled, so no domain starves
    * another), and within each source documents fill that allocation BEST
    * FIRST under [[topQualityPerSource]]'s deterministic quality key
    * (micronat distinct-token ratio, then length, then doc_id) instead of
    * the seeded-random order a plain sample plan uses. A doc is selected
    * iff its preceding cumulative token count is still below the source's
    * allocation — the same packing convention as [[budgetedSamplePlan]],
    * so per-source selected totals land in [alloc, alloc + max doc) when
    * the allocation binds.
    *
    * `maxEpochs = 1.0` by construction: a SELECTION chooses which docs to
    * keep, it never repeats one — so a source's cap is its own token total
    * and the waterfill only decides where the budget cuts.
    *
    * Exact and engine-portable: integer quality keys, long running sums,
    * the q202 waterfill — the whole plan replays in SQL.
    *
    * Scale shape: the |sources|-row allocation BROADCASTS back; one window
    * PARTITIONED BY source for the running sum; everything else is a map. */
  def budgetedQualitySelection(docs: DataFrame,
                               budgetTokens: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val alloc = tokenBudgetAllocation(docs, budgetTokens, maxEpochs = 1.0)
      .filter(col("t_tokens") > 0)
      .select(col("source"), col("alloc_tokens"))
    // shared quality key (zero-token docs rank last; they also add nothing
    // to the running sum, so selection stays well-defined either way)
    val feats = qualityFeatures(docs)
    val w = Window.partitionBy("source")
      .orderBy(desc("distinct_micro"), desc("n_tokens"), asc("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    feats.join(broadcast(alloc), Seq("source"))
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .filter(col("cum_before") < col("alloc_tokens"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("distinct_micro"), col("cum_before"))
  }

  def packingPlan(docs: DataFrame, capacity: Int = 4096): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col("doc_id"), col("source"),
      size(TextStats.tokens(TextStats.normalize(col("text")))).cast("long")
        .as("n_tokens"))
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks.select(col("doc_id"), col("source"), col("n_tokens"),
        sum(col("n_tokens")).over(w).as("cum_tokens"))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("cum_tokens"),
        ((col("cum_tokens") - col("n_tokens")) / lit(capacity)).cast("long")
          .as("start_bin"),
        ((col("cum_tokens") - 1) / lit(capacity)).cast("long").as("end_bin"))
  }
}
