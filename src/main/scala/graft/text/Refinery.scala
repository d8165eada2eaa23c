package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed batch corpus pipeline — raw documents in, training chunks
  * out — wiring the library's pieces in their canonical order:
  *
  *   1. quality gate ([[TextStats.qualityScore]]'s filter predicate)
  *   2. exact + near-duplicate removal ([[Dedup.dedupCorpus]])
  *   3. per-source cap ([[TextFeatures.perSourceCap]], reproducible sample)
  *   4. fixed-window chunking with stride ([[TextFeatures.chunkPlan]])
  *
  * Each stage is a lazy DataFrame transform, so Catalyst plans the whole
  * refinery as one DAG: the gate's predicate runs inside the scan
  * projection, dedup shuffles 64-bit keys only, the cap moves at most
  * `maxDocsPerSource` rows per source through its exchange, and chunking
  * adds no shuffle at all. Order matters at scale: gate before dedup
  * (cheap map first shrinks the shuffle), dedup before the cap (so kept
  * slots aren't wasted on duplicates), chunking last.
  */
object Refinery {

  final case class Config(
      minTokens: Int = 20,
      minDistinctRatio: Double = 0.2,
      nearDupThreshold: Double = 0.8,
      maxDocsPerSource: Int = 1000000,
      chunk: Int = 128,
      stride: Int = 96)

  /** Quality gate as a standalone predicate-pushable filter (the shared
    * [[TextStats.passesQualityGate]] predicate, parameterized). */
  def gate(docs: DataFrame, cfg: Config): DataFrame =
    docs.filter(TextStats.passesQualityGate(cfg.minTokens, cfg.minDistinctRatio))

  /** Full refinery: returns the chunk plan (doc_id, n_tokens, chunk_idx,
    * start_tok, chunk_len) over the gated, deduped, capped corpus. */
  def refine(docs: DataFrame, cfg: Config = Config()): DataFrame = {
    val gated = gate(docs, cfg)
    val deduped = Dedup.dedupCorpus(gated, threshold = cfg.nearDupThreshold)
    val capped = deduped.join(
      TextFeatures.perSourceCap(deduped, cfg.maxDocsPerSource).select("doc_id"),
      Seq("doc_id"), "left_semi")
    TextFeatures.chunkPlan(capped, cfg.chunk, cfg.stride)
  }
}
