package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{LearnedEncoder, MediaDedup}
import graft.sim.Similarity
import graft.tables.{LakeTable, TempLakes}

/** The learned-embedding stand-in (q295): seeded integer random
  * projection served through the production lifecycle — versioned lake
  * artifact, driver load + validation, broadcast, per-JVM model build
  * inside mapPartitions, batch encode. */
class LearnedEncoderSpec extends SparkSpec {

  test("train -> save -> load round-trips the closed-form weights, and " +
    "serving equals the direct matrix multiply") {
    import spark.implicits._
    val inDim = 6; val outDim = 4; val seed = 11L
    val dir = TempLakes.create("graft_enc_spec")
    val lake = new LakeTable(spark, dir)
    LearnedEncoder.saveEncoder(lake, "t",
      LearnedEncoder.trainProjection(spark, inDim, outDim, seed),
      inDim, outDim, seed)
    val m = LearnedEncoder.loadEncoder(lake, "t")
    assert(m.inDim === inDim && m.outDim === outDim && m.seed === seed)
    for (o <- 0 until outDim; i <- 0 until inDim)
      assert(m.weights(o * inDim + i) ===
        LearnedEncoder.weight(seed, o.toLong, i.toLong), s"w($o,$i)")
    // serve two vectors; compare against a plain reference multiply
    val vecs = Seq(
      (1L, Array(1.0, 0.0, 2.0, 5.0, 3.0, 4.0)),
      (2L, Array(7.0, 1.0, 0.0, 0.0, 9.0, 2.0)))
    val served = LearnedEncoder.encodeWithModel(m,
        vecs.toDF("vec_id", "embedding"))
      .as[(Long, Array[Double])].collect().toMap
    for ((id, x) <- vecs; o <- 0 until outDim) {
      val expect = (0 until inDim)
        .map(i => LearnedEncoder.weight(seed, o.toLong, i.toLong) * x(i)).sum
      assert(served(id)(o) === expect.toDouble, s"vec $id dim $o")
    }
  }

  test("the per-JVM model cache builds AT MOST ONCE per model key " +
    "across repeated serves (the session-load seam, not per-row load)") {
    import spark.implicits._
    val inDim = 3; val outDim = 2; val seed = 23L
    val m = graft.multimodal.LearnedEncoder.ProjectionModel(inDim, outDim,
      seed, Array.tabulate(inDim * outDim)(k =>
        LearnedEncoder.weight(seed, k / inDim, k % inDim)))
    val vecs = (0L until 40L).map(i =>
      (i, Array(i.toDouble, 1.0, 2.0))).toDF("vec_id", "embedding")
    val before = LearnedEncoder.buildCount.get()
    // two full serves over multiple partitions: same key, one build
    assert(LearnedEncoder.encodeWithModel(m, vecs.repartition(4))
      .count() === 40L)
    assert(LearnedEncoder.encodeWithModel(m, vecs.repartition(4))
      .count() === 40L)
    val builds = LearnedEncoder.buildCount.get() - before
    assert(builds <= 1L, s"model built $builds times (want <= 1: the " +
      "first serve may find the key already cached from another test)")
  }

  test("artifact validation fails by name: missing weight rows and " +
    "input-dim mismatches") {
    import spark.implicits._
    val dir = TempLakes.create("graft_enc_spec_bad")
    val lake = new LakeTable(spark, dir)
    val full = LearnedEncoder.trainProjection(spark, 4, 3, 5L)
    LearnedEncoder.saveEncoder(lake, "holey",
      full.filter(!(col("dim_out") === 1 && col("dim_in") === 2)), 4, 3, 5L)
    val e1 = intercept[IllegalArgumentException](
      LearnedEncoder.loadEncoder(lake, "holey"))
    assert(e1.getMessage.contains("missing entries"), e1.getMessage)
    // a well-formed model rejects vectors of the wrong width
    LearnedEncoder.saveEncoder(lake, "ok", full, 4, 3, 5L)
    val m = LearnedEncoder.loadEncoder(lake, "ok")
    val bad = Seq((1L, Array(1.0, 2.0))).toDF("vec_id", "embedding")
    val e2 = intercept[Exception](
      LearnedEncoder.encodeWithModel(m, bad).collect())
    assert(e2.getMessage.contains("3x4 model"), e2.getMessage)
  }

  test("projected embeddings keep the (vec_id, embedding) contract and " +
    "plug into the similarity surface: a cross-format re-encode is its " +
    "probe's nearest neighbor at cosine 1 in PROJECTED space too") {
    val docs = spark.range(24).select(col("id").as("doc_id"))
    val desc = MediaDedup.imageDescriptors(
      MediaDedup.syntheticCrossFormatImages(docs)).persist()
    val m = graft.multimodal.LearnedEncoder.ProjectionModel(88, 16, 7L,
      Array.tabulate(88 * 16)(k =>
        LearnedEncoder.weight(7L, k / 88, k % 88)))
    val proj = LearnedEncoder.encodeWithModel(m, desc).persist()
    val top = Similarity.bruteForceTopK(proj, proj.filter(col("vec_id") < 4), 1)
      .collect()
    // the fixture pairs doc 2k with its re-encode 2k+1: identical input
    // descriptors project to identical vectors -> cosine exactly 1
    for (r <- top) {
      val probe = r.getAs[Long]("probe_id")
      assert(r.getAs[Long]("neighbor_id") === (probe ^ 1L), s"probe $probe")
      // identical vectors read as cosine 1 up to sqrt-norm rounding
      // (dot/(√·√) can land one ulp above 1.0)
      assert(math.abs(r.getAs[Double]("cos_sim") - 1.0) < 1e-12,
        s"probe $probe cos ${r.getAs[Double]("cos_sim")}")
    }
    desc.unpersist(); proj.unpersist(): Unit
  }
}
