package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and word-set Jaccard. All deterministic (hash functions are
  * seeded `xxhash64`), all shuffle-aware:
  *
  *  - exact dedup: one hash-groupBy shuffle on a 64-bit key (not the text
  *    itself — at 100 TB you never shuffle full documents to compare them);
  *  - MinHash/LSH: signatures are a pure map; candidate generation is an
  *    equi-join on (band, bandHash) buckets, so the only shuffle key is a
  *    small int pair and skew is bounded by bucket size;
  *  - SimHash: 64 codegen'd conditional sums per doc — a single partial+final
  *    aggregate, no per-doc loops.
  */
object Dedup {

  /** 64-bit exact-dup key over the normalized text. */
  def exactKey(text: Column): Column = xxhash64(TextStats.normalize(text))

  /** Exact duplicate groups: key, keeper (min doc_id), group size. */
  def exactDupGroups(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), exactKey(col("text")).as("dup_key"))
      .groupBy("dup_key")
      .agg(min("doc_id").as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Dataset with exact duplicates removed (keeps min doc_id per group). */
  def dropExactDups(docs: DataFrame): DataFrame = {
    val keepers = exactDupGroups(docs).select(col("keeper_id").as("doc_id"))
    docs.join(keepers, Seq("doc_id"), "left_semi")
  }

  /** MinHash signature: for each of `numPerms` seeded hash functions, the
    * minimum over the document's shingle set. Pure map, codegen'd
    * (`transform` + `array_min` over the shingle array). */
  def minhashSignature(text: Column, numPerms: Int, shingleSize: Int): Column = {
    val sh = array_distinct(TextStats.shingles(text, shingleSize))
    val perms = (0 until numPerms).map { seed =>
      array_min(transform(sh, s => xxhash64(lit(seed), s)))
    }
    array(perms: _*)
  }

  /** LSH banding: (bandId, bandHash) pairs from a MinHash signature; docs
    * sharing any band bucket are near-dup candidates. */
  def lshBands(signature: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      struct(b.as("band"),
        xxhash64(concat_ws("_", slice(signature, b * rowsPerBand + 1, lit(rowsPerBand))),
          b).as("band_hash")))

  /** Near-duplicate candidate pairs via MinHash + LSH, verified with exact
    * word-set Jaccard and filtered at `threshold`. Returns
    * (doc_a, doc_b, jaccard). The verify join re-reads only candidate pairs —
    * candidate count, not corpus size squared, bounds the cost. */
  def minhashNearDups(docs: DataFrame, numPerms: Int = 32, bands: Int = 8,
                      shingleSize: Int = 3, threshold: Double = 0.5): DataFrame = {
    val rowsPerBand = numPerms / bands
    val sig = docs.select(col("doc_id"),
      minhashSignature(col("text"), numPerms, shingleSize).as("sig"))
    val buckets = sig.select(col("doc_id"),
        explode(lshBands(col("sig"), bands, rowsPerBand)).as("b"))
      .select(col("doc_id"), col("b.band"), col("b.band_hash"))
    val pairs = buckets.as("x").join(buckets.as("y"),
        col("x.band") === col("y.band") &&
          col("x.band_hash") === col("y.band_hash") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val words = docs.select(col("doc_id"),
      array_distinct(TextStats.tokens(TextStats.normalize(col("text")))).as("w"))
    pairs
      .join(words.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("w", "wa"), "doc_a")
      .join(words.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("w", "wb"), "doc_b")
      .select(col("doc_a"), col("doc_b"), jaccard(col("wa"), col("wb")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Exact Jaccard similarity of two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = (size(a) + size(b)).cast("double") - inter
    when(union === 0, lit(1.0)).otherwise(inter / union)
  }

  /** Word-set Jaccard over blocked candidate pairs (equi-join on blocking
    * keys only — at scale the blocking key choice bounds the pair count). */
  def blockedJaccardPairs(docs: DataFrame, blockingKeys: Seq[String],
                          threshold: Double): DataFrame = {
    val words = docs.select(
      (col("doc_id") +: blockingKeys.map(col)) :+
        array_distinct(TextStats.tokens(TextStats.normalize(col("text")))).as("w"): _*)
    val joinCond = blockingKeys.map(k => col(s"x.$k") === col(s"y.$k"))
      .reduce(_ && _) && col("x.doc_id") < col("y.doc_id")
    words.as("x").join(words.as("y"), joinCond)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        jaccard(col("x.w"), col("y.w")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash fingerprint per document: explode tokens once, then 64
    * conditional sums (+1/-1 per bit) in ONE hash aggregate, reassembled into
    * a long. Scales as a single shuffle on doc_id with map-side combine. */
  def simhash(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol),
        explode(array_distinct(TextStats.tokens(TextStats.normalize(col(textCol))))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1L) === 1L, 1L).otherwise(-1L)).as(s"b$j")
    }
    val agg = toks.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until 64).map { j =>
      when(col(s"b$j") >= 0, shiftleft(lit(1L), j)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))
    agg.select(col(idCol), fp.as("simhash"))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
