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

  /** Deterministic stratified sample: per-stratum fractions, seeded. */
  def stratifiedSample(df: DataFrame, stratumCol: String,
                       fractions: Map[String, Double], seed: Long = 42L): DataFrame =
    df.stat.sampleBy(stratumCol, fractions, seed)

  /** Seeded train/validation/test split for pipeline reproducibility. */
  def trainValTest(df: DataFrame, weights: Array[Double] = Array(0.8, 0.1, 0.1),
                   seed: Long = 42L): Array[DataFrame] =
    df.randomSplit(weights, seed)
}
