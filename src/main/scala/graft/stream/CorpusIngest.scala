package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.tables.{LakeTable, Tables}
import graft.text.{Dedup, TextStats}

/** Streaming corpus ingestion — the incremental form of the pre-training
  * data pipeline: new document files are quality-gated, exact-deduped
  * within the batch AND against everything already committed, then appended
  * to the lake as one commit per micro-batch.
  *
  * Scale design: the against-the-lake dedup is an anti-join on the 128-bit
  * exact key ONLY — the lake side projects (k1, k2) out of its parquet
  * (column-pruned scan, no text bytes move), and the incoming micro-batch
  * is small, so the anti-join broadcasts the batch keys. State never lives
  * in the streaming state store; the lake itself is the dedup index, which
  * survives restarts for free (checkpoint replays re-land only files the
  * sink has not committed).
  */
object CorpusIngest {

  /** File-source stream over a documents-schema parquet directory. */
  def readDocStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(Tables.schemas("documents")).parquet(dir)

  /** Quality gate — a pure map predicate (no self-join, streaming-safe,
    * stays inside whole-stage codegen): the shared
    * [[TextStats.passesQualityGate]] screen, or the full Gopher rule bundle
    * ([[TextStats.passesGopherGate]]) under `gate = "gopher"` — the SAME
    * predicates the batch refinery gates with
    * ([[graft.text.Refinery.gate]]), so batch and stream admit identical
    * documents. */
  def qualityGate(docs: DataFrame, gate: String = "basic"): DataFrame =
    gate match {
      case "gopher" => docs.filter(TextStats.passesGopherGate())
      case "basic"  => docs.filter(TextStats.passesQualityGate())
      case other =>
        throw new IllegalArgumentException(s"unknown gate '$other' (basic|gopher)")
    }

  /** Start the ingest: quality-gate, dedup (in-batch + against the lake),
    * append to `table`. Returns the started query. */
  def start(spark: SparkSession, dir: String, lake: LakeTable, table: String,
            trigger: Trigger = Trigger.AvailableNow(),
            checkpoint: Option[String] = None,
            gate: String = "basic"): StreamingQuery = {
    val w = readDocStream(spark, dir).writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val gated = qualityGate(batch.toDF(), gate)
        // in-batch exact dedup: keep min doc_id per normalized text
        val fresh = Dedup.dropExactDups(gated)
          .withColumn("dup_key", Dedup.exactKey(col("text")))
        val novel =
          if (lake.exists(table)) {
            val seen = lake.read(table).select(col("dup_key"))
            fresh.join(seen, Seq("dup_key"), "left_anti")
          } else fresh
        val mode = if (lake.exists(table)) "append" else "overwrite"
        lake.write(novel, table, mode): Unit
      }
      .trigger(trigger)
    // a checkpoint skips re-listing already-processed files; even WITHOUT
    // one, replays are idempotent because the lake's keys absorb them
    checkpoint.fold(w)(c => w.option("checkpointLocation", c)).start()
  }

  /** NEAR-duplicate-aware streaming ingest: each micro-batch is quality
    * gated, exact-deduped, near-dedup'd WITHIN the batch (MinHash pairs →
    * connected components, keep the min doc_id), then checked against the
    * COMMITTED corpus before appending — so the landed table stays
    * near-dup-free across batches, restarts, and replays.
    *
    * The lake is the near-dup index: every committed row carries its
    * `dup_key` (128-bit exact key) and `lsh_bands` (the MinHash band
    * hashes). The against-the-lake check is
    *   (1) an anti-join on dup_key (exact),
    *   (2) an equi-join of the batch's exploded band keys against the
    *       lake's exploded `lsh_bands` — column-pruned to (doc_id, bands):
    *       no committed text moves to form candidates,
    *   (3) exact word-set Jaccard verification that reads committed TEXT
    *       for the candidate doc ids only (a semi-join-sized point read).
    * Candidate volume is bounded by band-collision rate, not corpus size —
    * the same bound as a full-corpus MinHash dedup, paid incrementally.
    * Documents too short to shingle produce no bands and are exact-dedup'd
    * only (identical to the batch pipeline's behavior).
    *
    * `shufflePartitions`: size the per-batch pipeline's shuffles to the
    * MICRO-BATCH, not the cluster default — the ~70-action decision DAG
    * runs on batch-sized data, and cluster-sized shuffle widths spend more
    * wall clock on task scheduling and AQE re-planning than on rows
    * (measured 18.8 → 12.0 s per two-batch run at a 32 → 8 width). The
    * session conf is set for the batch and restored after; every operator
    * in the pipeline is partition-count-invariant, so results are
    * unchanged. None (default) leaves the session untouched. */
  def startNearDup(spark: SparkSession, dir: String, lake: LakeTable,
                   table: String, threshold: Double = 0.8, numPerms: Int = 32,
                   bands: Int = 8, shingleSize: Int = 3,
                   containmentThreshold: Option[Double] = None,
                   sketchK: Int = 64,
                   trigger: Trigger = Trigger.AvailableNow(),
                   checkpoint: Option[String] = None,
                   shingleVerify: Boolean = false,
                   gate: String = "basic",
                   lmGate: Option[LmGate] = None,
                   nbGate: Option[NbGate] = None,
                   shufflePartitions: Option[Int] = None): StreamingQuery = {
    val w = readDocStream(spark, dir).writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        nearDupBatch(batch.toDF(), lake, table, threshold, numPerms, bands,
          shingleSize, containmentThreshold, sketchK, shingleVerify, gate,
          lmGate, nbGate, shufflePartitions)
      }
      .trigger(trigger)
    checkpoint.fold(w)(c => w.option("checkpointLocation", c)).start()
  }

  /** CCNet LM admission gate for the streaming ingest: score each batch
    * against a PRE-TRAINED model (load once with
    * [[graft.text.LangModel.loadLm]] — the model is static per query, the
    * CCNet deployment shape) and reject docs whose avg negative
    * log-likelihood exceeds `maxAvgNllMicronats`; unscored (<2-token) docs
    * pass, exactly like the batch refinery's lmFilter contract. A FIXED
    * nll threshold replaces the batch pipeline's global rank cutoff — a
    * stream cannot rank against documents it has not seen, so the
    * threshold is calibrated offline ([[graft.text.LangModel.calibrateLmGate]]
    * derives it from a representative batch's tail-tier boundary) and
    * applied incrementally. */
  final case class LmGate(model: graft.text.LangModel.LmModel,
                          maxAvgNllMicronats: Long)

  /** Learned-classifier admission gate for the streaming ingest — the
    * stream twin of the refinery's `classifierFilter` stage: score each
    * batch against a PRE-TRAINED Naive Bayes model (load once with
    * [[graft.text.QualityClassifier.loadClassifier]]) and reject docs
    * whose per-gram log-odds average falls below `minAvgMicronats`
    * (0 = "more reference-like than pool-like" — the log-odds sign, so
    * unlike the LM gate no rank calibration is needed); unscored
    * (zero-token) docs pass, the lmFilter contract. */
  final case class NbGate(model: graft.text.QualityClassifier.NbModel,
                          minAvgMicronats: Long = 0L)

  /** The per-micro-batch decision pipeline of [[startNearDup]], factored out
    * so a BATCH caller can replay the exact admit/reject decisions a
    * streaming ingest makes ([[nearDupIngestTwin]] — the q171 batch-twin
    * discipline applied to corpus ingestion). `shingleVerify = true` swaps
    * both near-dup verifies (in-batch and against-the-lake) from word-set
    * to SHINGLE-set Jaccard at [[Dedup.minhashNearDupsShingle]]'s banding
    * defaults — the metric whose banded == brute-force equality is the
    * corpus-verified q24 contract, which is what makes the whole ingest
    * declaratively oracle-replayable. */
  private[graft] def nearDupBatch(batchDf: DataFrame, lake: LakeTable,
                                  table: String, threshold: Double,
                                  numPerms: Int, bands: Int, shingleSize: Int,
                                  containmentThreshold: Option[Double],
                                  sketchK: Int, shingleVerify: Boolean,
                                  gate: String,
                                  lmGate: Option[LmGate] = None,
                                  nbGate: Option[NbGate] = None,
                                  shufflePartitions: Option[Int] = None): Unit =
    shufflePartitions match {
      case Some(n) =>
        // micro-batch shuffle sizing (see startNearDup's scaladoc): session
        // conf set for the batch, restored in finally — the stream's
        // foreachBatch body is the only planner while it runs
        val spark = batchDf.sparkSession
        val key = "spark.sql.shuffle.partitions"
        val aqKey = "spark.sql.adaptive.enabled"
        val prev = spark.conf.get(key)
        val aqPrev = spark.conf.get(aqKey)
        spark.conf.set(key, n.toString)
        // AQE re-plans every exchange; on micro-batch-sized data that is
        // pure scheduling tax (the q223 measurement: 132 -> 55 jobs) — a
        // batch sized to need sized-down shuffles never needs runtime
        // re-planning either
        spark.conf.set(aqKey, "false")
        try nearDupBatchBody(batchDf, lake, table, threshold, numPerms,
          bands, shingleSize, containmentThreshold, sketchK, shingleVerify,
          gate, lmGate, nbGate)
        finally { spark.conf.set(key, prev); spark.conf.set(aqKey, aqPrev) }
      case None =>
        nearDupBatchBody(batchDf, lake, table, threshold, numPerms, bands,
          shingleSize, containmentThreshold, sketchK, shingleVerify, gate,
          lmGate, nbGate)
    }

  private def nearDupBatchBody(batchDf: DataFrame, lake: LakeTable,
                               table: String, threshold: Double,
                               numPerms: Int, bands: Int, shingleSize: Int,
                               containmentThreshold: Option[Double],
                               sketchK: Int, shingleVerify: Boolean,
                               gate: String,
                               lmGate: Option[LmGate],
                               nbGate: Option[NbGate]): Unit = {
    val rowsPerBand = numPerms / bands
    def withIndexCols(docs: DataFrame): DataFrame = {
      val sig = Dedup.minhashSignatures(docs, numPerms, shingleSize)
        .select(col("doc_id"),
          Dedup.lshBands(col("sig"), bands, rowsPerBand).as("lsh_bands"))
      docs.withColumn("dup_key", Dedup.exactKey(col("text")))
        .join(sig, Seq("doc_id"), "left")
        .withColumn("lsh_bands", coalesce(col("lsh_bands"),
          expr("CAST(array() AS array<struct<band:int,band_hash:bigint>>)")))
    }
    // the candidate-verify sets: distinct words, or distinct shingles under
    // shingleVerify (two-stage projection per Dedup.shingleSets's note)
    def setsOf(d: DataFrame, idc: String, wc: String): DataFrame = {
      val base = d.select(col(idc),
        graft.text.TextStats.tokens(
          graft.text.TextStats.normalize(col("text"))).as("toks"))
      if (shingleVerify)
        base.select(col(idc), array_distinct(
          graft.text.TextStats.shinglesOf(col("toks"), shingleSize)).as(wc))
      else
        base.select(col(idc), array_distinct(col("toks")).as(wc))
    }
    {
        // per-batch persist set: this pipeline's DAG is DEEP (gate -> exact
        // -> LSH+verify -> closure -> containment -> re-sign -> vs-lake
        // joins) and has many consumers per stage — unpersisted, the chain
        // re-evaluates ~8x per batch (measured 62 -> 21 s on the q196 twin
        // at sf0.1). Every entry is released in the cleanup below, so a
        // long-running stream still holds nothing across micro-batches.
        val stageCaches =
          scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Dataset[_]]
        def cut(df: DataFrame): DataFrame = { stageCaches += df.persist(); df }
        val gated0 = qualityGate(batchDf, gate)
        // LM admission gate after the rule gate (the refinery's stage
        // order): reject scored docs above the fixed nll threshold
        val gated = lmGate match {
          case Some(g) =>
            val bad = graft.text.LangModel.scoreWithLm(g.model, gated0)
              .filter(col("avg_nll_micronats") > g.maxAvgNllMicronats)
              .select("doc_id")
            gated0.join(bad, Seq("doc_id"), "left_anti")
          case None => gated0
        }
        // learned-classifier admission after the LM gate (the refinery's
        // stage order): reject scored docs below the log-odds floor
        val gatedNb = nbGate match {
          case Some(g) =>
            val bad = graft.text.QualityClassifier
              .scoreWithClassifier(g.model, gated)
              .filter(col("avg_micronats") < g.minAvgMicronats)
              .select("doc_id")
            gated.join(bad, Seq("doc_id"), "left_anti")
          case None => gated
        }
        // in-batch: exact dedup, then near-dup clusters keep min doc_id
        val exact = cut(Dedup.dropExactDups(gatedNb))
        val inPairs = cut(
          if (shingleVerify) Dedup.minhashNearDupsShingle(exact, numPerms,
            bands, shingleSize, threshold)
          else Dedup.minhashNearDups(exact, numPerms, bands,
            shingleSize, threshold))
        val jaccardKept =
          if (inPairs.isEmpty) exact
          else exact.join(Dedup.clusterPairs(inPairs), Seq("doc_id"), "left")
            .filter(col("cluster_id").isNull || col("doc_id") === col("cluster_id"))
            .drop("cluster_id")
        // in-batch containment (opt-in): drop docs embedded in other batch
        // survivors — the same stage order as the batch refinery. The
        // TRACKED form hands back the banded stage's internal persists: a
        // long-running stream has no harness releaseAll between batches, so
        // they are released below with the landed/batchGrams cleanup — not
        // left to accumulate in executor storage memory across micro-batches.
        var containCaches: Seq[org.apache.spark.sql.Dataset[_]] = Nil
        val batchKept = containmentThreshold match {
          case Some(t) =>
            val (dropped, caches) = Dedup.dropContainedTracked(jaccardKept,
              shingleSize, t, maxDf = Long.MaxValue, sketchK = sketchK)
            containCaches = caches
            dropped
          case None => jaccardKept
        }
        // persist + materialize + FLATTEN at the two deep cut points: by
        // here the logical tree is gate -> exact -> LSH+verify -> closure
        // -> containment -> re-sign, and the vs-lake stage below issues
        // ~8 more actions on derivatives of it — each would re-analyze the
        // whole tree (Catalyst planning, not execution, measured ~46 s of
        // the 53 s batch-2 wall clock; the data itself is ~100k rows).
        // flattenLineage rebinds to the materialized cache as a leaf, the
        // same move connectedComponents makes per round.
        def cutFlat(df: DataFrame): DataFrame = {
          val p = cut(df); p.count(): Unit
          org.apache.spark.sql.GraftSqlBridge.flattenLineage(p)
        }
        val indexed = cutFlat(withIndexCols(batchKept))
        val novel =
          if (!lake.exists(table)) indexed
          else {
            val committed = lake.read(table)
            // (1) exact: anti-join on the 128-bit key
            val notExact = cut(indexed.join(
              committed.select(col("dup_key")), Seq("dup_key"), "left_anti"))
            // (2) candidates: band-key equi-join, bands column only
            val batchBands = notExact.select(col("doc_id"),
              explode(col("lsh_bands")).as("b"))
            val lakeBands = committed.select(col("doc_id").as("lake_doc_id"),
              explode(col("lsh_bands")).as("b"))
            val cand = batchBands.join(lakeBands, Seq("b"))
              .select("doc_id", "lake_doc_id").distinct()
            // (3) verify with exact Jaccard (word sets, or shingle sets
            // under shingleVerify) — committed text for candidates only:
            // the broadcast left-semi PRUNES the committed side to the
            // (small, per-batch) candidate id set BEFORE tokenization, so
            // per-batch verify cost tracks candidate count, not corpus size
            // (a plain join after tokenizing would tokenize the whole lake
            // every micro-batch)
            val candLake = committed
              .select(col("doc_id").as("lake_doc_id"), col("text"))
              .join(broadcast(cand.select("lake_doc_id").distinct()),
                Seq("lake_doc_id"), "left_semi")
            val dupIds = cand
              .join(setsOf(notExact, "doc_id", "wa"), Seq("doc_id"))
              .join(setsOf(candLake, "lake_doc_id", "wb"), Seq("lake_doc_id"))
              .filter(Dedup.jaccard(col("wa"), col("wb")) >= threshold)
              .select("doc_id").distinct()
            notExact.join(dupIds, Seq("doc_id"), "left_anti")
          }
        // against-the-lake CONTAINMENT (opt-in): drop an incoming doc
        // embedded in an already-committed one (c(new→old) ≥ t — the lake
        // side is immutable, so the check is one-directional). The lake's
        // containment index is the `{table}_grams` side table (doc_id,
        // 64-bit gram hash); candidates come from the batch docs' bottom-k
        // gram sketches probing that index with the SAME salted ordering
        // and evidence-count prune as Dedup.containmentNearDupsBanded
        // (doc-salted sample kills the hub-gram df blow-up; 4·s ≥
        // t·min(k, sz) keeps a true containment except with ~2e-10
        // Chernoff probability), and the exact shared-count verify reads
        // index rows for candidate pairs only.
        val gramsTable = s"${table}_grams"
        // index bootstrap/repair BEFORE the check: the corpus write and the
        // index write are two separate commits, so a crash between them —
        // or enabling containment on a lake with existing commits — leaves
        // committed docs missing from the index. Reconciling here (grams of
        // committed docs absent from the index, an id anti-join on two
        // column-pruned projections) restores "the index covers the table"
        // no matter how the previous run ended.
        if (containmentThreshold.isDefined && lake.exists(table)) {
          val committed = lake.read(table).select("doc_id", "text")
          val missing =
            if (!lake.exists(gramsTable)) committed
            else committed.join(
              lake.read(gramsTable).select("doc_id").distinct(),
              Seq("doc_id"), "left_anti")
          if (!missing.isEmpty) {
            val gmode = if (lake.exists(gramsTable)) "append" else "overwrite"
            lake.write(Dedup.docGrams(missing, shingleSize),
              gramsTable, gmode): Unit
          }
        }
        val novelF = cutFlat(novel)
        var batchGrams: Option[org.apache.spark.sql.DataFrame] = None
        val landed0 = containmentThreshold match {
          case Some(t) if lake.exists(gramsTable) =>
            import org.apache.spark.sql.expressions.Window
            val grams = Dedup.docGrams(novelF, shingleSize).persist()
            batchGrams = Some(grams)
            val sz = grams.groupBy("doc_id").agg(count(lit(1)).as("sz"))
            val rk = Window.partitionBy("doc_id")
              .orderBy(xxhash64(col("doc_id"), col("g")), col("g"))
            val sketch = grams.withColumn("rk", row_number().over(rk))
              .filter(col("rk") <= sketchK).select("doc_id", "g")
            val lakeGrams = lake.read(gramsTable)
              .select(col("doc_id").as("lake_doc_id"), col("g"))
            val cand = sketch.join(lakeGrams, Seq("g"))
              .groupBy("doc_id", "lake_doc_id").agg(count(lit(1)).as("s"))
              .join(sz, Seq("doc_id"))
              .filter(col("s").cast("double") * 4.0 >= lit(t) *
                least(lit(sketchK.toLong), col("sz")).cast("double"))
              .select("doc_id", "lake_doc_id", "sz")
            val contained = cand
              .join(grams, Seq("doc_id"))
              .join(lakeGrams, Seq("lake_doc_id", "g"))
              .groupBy("doc_id", "lake_doc_id", "sz")
              .agg(count(lit(1)).as("n_shared"))
              .filter(col("n_shared").cast("double") / col("sz").cast("double")
                >= t)
              .select("doc_id").distinct()
            novelF.join(contained, Seq("doc_id"), "left_anti")
          case _ => novelF
        }
        // one evaluation of the whole per-batch pipeline: the corpus write
        // AND the grams-index write below both read `landed`
        val landed = landed0.persist()
        val mode = if (lake.exists(table)) "append" else "overwrite"
        lake.write(landed, table, mode): Unit
        // maintain the containment index for the NEXT batches (landed rows
        // only, so the index mirrors the table; a crash before this write
        // is healed by the bootstrap/repair pass above on the next batch)
        if (containmentThreshold.isDefined) {
          val gmode = if (lake.exists(gramsTable)) "append" else "overwrite"
          lake.write(Dedup.docGrams(landed.select("doc_id", "text"), shingleSize),
            gramsTable, gmode): Unit
        }
        landed.unpersist(): Unit
        batchGrams.foreach(_.unpersist(): Unit)
        containCaches.foreach(graft.ops.Caching.release)
        stageCaches.foreach(graft.ops.Caching.release)
    }
  }

  /** BATCH TWIN of a two-batch [[startNearDup]] ingest — replays the
    * admit/reject decisions (gate → in-batch exact/near-dup/containment →
    * against-the-lake exact/near-dup/containment, two commits) through the
    * SAME per-batch pipeline ([[nearDupBatch]]) against a throwaway lake,
    * so stream == twin is structural, not approximate (CorpusIngestSpec
    * pins it row-for-row). With the default `shingleVerify = true` every
    * stage is declaratively replayable — banded near-dup == brute-force
    * shingle Jaccard (the q24 contract) and the sketch-probed containment
    * == exact counting (the q185 contract) — which is how the q196 oracle
    * spells the whole ingest. Returns the landed corpus (doc_id, n_chars). */
  def nearDupIngestTwin(spark: SparkSession, batch1: DataFrame,
                        batch2: DataFrame, threshold: Double = 0.8,
                        numPerms: Int = 128, bands: Int = 32,
                        shingleSize: Int = 3,
                        containmentThreshold: Option[Double] = None,
                        sketchK: Int = 64, shingleVerify: Boolean = true,
                        gate: String = "basic",
                        lmGate: Option[LmGate] = None,
                        nbGate: Option[NbGate] = None,
                        shufflePartitions: Option[Int] = None): DataFrame = {
    val dir = graft.tables.TempLakes.create("graft_ingest_twin_lake")
    val lake = new LakeTable(spark, dir)
    Seq(batch1, batch2).foreach(b =>
      nearDupBatch(b, lake, "twin", threshold, numPerms, bands, shingleSize,
        containmentThreshold, sketchK, shingleVerify, gate, lmGate, nbGate,
        shufflePartitions))
    lake.read("twin").select(col("doc_id"), col("n_chars"))
  }
}
