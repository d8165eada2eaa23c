package graft

import org.apache.spark.sql.functions._

import graft.sim.Similarity
import graft.text.Dedup

/** Round-9 curation-telemetry specs: cross-source overlap matrix,
  * dedup-adjusted effective tokens, embedding outlier detection. */
class Round9bOpsSpec extends SparkSpec {

  test("sourceOverlapMatrix: cross-source copies land off-diagonal, internal dups on it") {
    import spark.implicits._
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val other = "one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen"
    val d = Seq(
      (1L, text, "mirror_a"), (2L, text, "mirror_b"),  // cross-source copy
      (3L, other, "selfdup"), (4L, other, "selfdup"),  // internal dup
      (5L, "totally different words entirely here now today", "clean"))
      .toDF("doc_id", "text", "source")
    val m = Dedup.sourceOverlapMatrix(d, threshold = 0.8)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m === Map(("mirror_a", "mirror_b") -> 1L, ("selfdup", "selfdup") -> 1L))
  }

  test("effectiveTokens: duplicated source shrinks, clean source keeps permille 1000") {
    import spark.implicits._
    val dup = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16 w17 w18 w19 w20"
    val d = Seq(
      (1L, dup, "dupsrc"), (2L, dup, "dupsrc"),
      (3L, "unique words only in this document right here today", "clean"))
      .toDF("doc_id", "text", "source")
    val out = Dedup.effectiveTokens(d, threshold = 0.8)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("raw_tokens"), r.getAs[Long]("effective_tokens"),
          r.getAs[Long]("kept_permille")))).toMap
    assert(out("dupsrc") === ((40L, 20L, 500L)))
    assert(out("clean") === ((9L, 9L, 1000L)))
  }

  test("versionDrift: identical versions drift 0; append drift equals the direct computation") {
    import org.apache.spark.sql.functions._
    val docs = graft.tables.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").persist()
    val dir = java.nio.file.Files.createTempDirectory("drift_spec_lake").toString
    val lake = new graft.tables.LakeTable(spark, dir)
    lake.write(docs.filter(col("doc_id") % 2 === 0), "docs", "overwrite"): Unit
    lake.write(docs.filter(col("doc_id") % 2 === 1), "docs", "append"): Unit
    // v0 vs v0: the same snapshot, JS must be exactly 0
    val same = graft.tables.Materialize.versionDrift(lake, "docs", 0L, 0L).head()
    assert(same.getAs[Double]("js_nats") === 0.0)
    // v0 vs v1 == the drift computed directly from the slices
    val viaLake = graft.tables.Materialize.versionDrift(lake, "docs", 0L, 1L).head()
    val direct = graft.text.TextStats.tokenDriftBetween(
      docs.filter(col("doc_id") % 2 === 0), docs).head()
    assert(viaLake.getAs[Long]("n_a_tokens") === direct.getAs[Long]("n_a_tokens"))
    assert(viaLake.getAs[Long]("n_b_tokens") === direct.getAs[Long]("n_b_tokens"))
    assert(viaLake.getAs[Double]("js_nats") === direct.getAs[Double]("js_nats"))
    assert(viaLake.getAs[Double]("js_nats") > 0.0)
    docs.unpersist()
  }

  test("embeddingOutliers is the farthest-first complement of diverseSubset's ranking") {
    // same quantizer params -> same centroids and distances; the outlier
    // set must be exactly the k largest (dist_micro, -vec_id) keys of the
    // full assignment diverseSubset exposes
    val emb = graft.tables.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val full = Similarity.diverseSubset(emb, n = Int.MaxValue, nLists = 4,
      iters = 2)
      .collect().map(r => (r.getAs[Long]("dist_micro"), r.getAs[Long]("vec_id")))
    val expected = full.sortBy { case (d, id) => (-d, id) }.take(7)
      .map(_._2).toSeq
    val got = Similarity.embeddingOutliers(emb, k = 7, nLists = 4, iters = 2)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(got === expected)
    // and the scores themselves arrive farthest-first
    val scores = Similarity.embeddingOutliers(emb, k = 7, nLists = 4, iters = 2)
      .collect().map(_.getAs[Long]("dist_micro"))
    assert(scores.sameElements(scores.sortBy(-(_: Long))))
  }
}
