package graft

import org.apache.spark.sql.functions._

import graft.sim.Similarity
import graft.text.TextFeatures

/** Round-9 operator specs: the unlabeled kNN graph, the IVF scale form of
  * semantic decontamination, and DSIR Gumbel-top-k resampling. */
class Round9OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // ---------------------------------------------------------------- knnGraph

  test("knnGraph with nProbe = nLists equals brute-force per-vector top-k") {
    val emb = graft.tables.Tables.load(spark, sf, "embeddings")
    // probing every cell makes the candidate set the whole corpus, so the
    // graph must equal the exact top-k, scores included
    val g = Similarity.knnGraph(emb, k = 2, nLists = 4, nProbe = 4, iters = 2)
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cos_sim"), r.getAs[Int]("rn"))).toSet
    val truth = Similarity.bruteForceTopK(emb, emb, k = 2)
      .select(col("probe_id"), col("neighbor_id"),
        round(col("cos_sim"), 6).as("cos_sim"), col("rn"))
      .collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cos_sim"), r.getAs[Int]("rn"))).toSet
    assert(g === truth)
  }

  test("hardNegatives is exactly the label-filtered knnGraph chain (q192 shape unchanged)") {
    // the factoring contract: on a corpus where every vector's nearest
    // neighbor has a DIFFERENT label, the kNN graph and hard negatives
    // coincide edge-for-edge
    val vecs = Seq(
      Vec(1, Array(1f, 0f, 0f, 0f), 0),
      Vec(2, Array(0.99f, 0.14f, 0f, 0f), 1),
      Vec(3, Array(0f, 0f, 1f, 0f), 0),
      Vec(4, Array(0f, 0.1f, 0.99f, 0f), 1))
    val d = df(vecs)
    val hn = Similarity.hardNegatives(d, k = 1, nLists = 2, nProbe = 2, iters = 4)
      .collect().map(r => (r.getAs[Long]("anchor_id"),
        r.getAs[Long]("negative_id"), r.getAs[Double]("cos_sim"))).toSet
    val g = Similarity.knnGraph(d, k = 1, nLists = 2, nProbe = 2, iters = 4)
      .collect().map(r => (r.getAs[Long]("vec_id"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos_sim"))).toSet
    assert(hn === g)
  }

  // ------------------------------------------- semanticContaminationIvf

  private def contamRows(out: org.apache.spark.sql.DataFrame) = out.collect()
    .map(r => (r.getAs[Long]("train_id"), r.getAs[Long]("closest_bench_id"),
      r.getAs[Double]("max_cos"), r.getAs[Long]("n_bench_hits"))).toSet

  test("semanticContaminationIvf equals the broadcast form on the testdata at q195's parameters") {
    // the triangle-inequality prune is exact, so this equality is an
    // identity — asserted here on the real data at the oracle's low
    // threshold 0.3 (where a fixed-nProbe IVF probe demonstrably loses
    // pairs: the prune must not)
    val emb = graft.tables.Tables.load(spark, sf, "embeddings")
    val train = emb.filter(col("vec_id") % 37 =!= 0)
    val bench = emb.filter(col("vec_id") % 37 === 0)
    val celled = Similarity.semanticContaminationIvf(train, bench,
      threshold = 0.3, nLists = 8, iters = 0, portableInit = true)
    val bc = Similarity.semanticContamination(train, bench, threshold = 0.3)
    assert(contamRows(celled) === contamRows(bc))
    graft.ops.Caching.releaseAll(spark)
  }

  test("semanticContaminationIvf equals the broadcast form on planted vectors") {
    val vecs = Seq(
      Vec(100, Array(1f, 0f, 0f, 0f), 0),
      Vec(101, Array(0.8f, 0.6f, 0f, 0f), 0),
      Vec(1, Array(0.95f, 0.31f, 0f, 0f), 0),
      Vec(2, Array(0f, 0f, 1f, 0f), 0),
      Vec(3, Array(0.55f, 0.84f, 0f, 0f), 0))
    val d = df(vecs)
    val train = d.filter(col("vec_id") < 100)
    val bench = d.filter(col("vec_id") >= 100)
    val celled = Similarity.semanticContaminationIvf(train, bench,
      threshold = 0.8, nLists = 2, iters = 4)
    val bc = Similarity.semanticContamination(train, bench, threshold = 0.8)
    assert(contamRows(celled) === contamRows(bc))
    assert(contamRows(celled).map(_._1) === Set(1L, 3L))
    graft.ops.Caching.releaseAll(spark)
  }

  test("semanticContaminationIvf radius prune actually skips provably-clean cells") {
    // two tight clusters far apart: bench sits in cluster A, so cluster
    // B's cell is outside eps + radius and the candidate join must not
    // read it — prune POWER, not just prune correctness
    val a = (1 to 10).map(i =>
      Vec(i.toLong, Array(1f, 0.001f * i, 0f, 0f), 0))
    val b = (11 to 20).map(i =>
      Vec(i.toLong, Array(0f, 0.001f * i, 1f, 0f), 0))
    val bench = Seq(Vec(100, Array(1f, 0.005f, 0f, 0f), 0))
    val train = df(a ++ b)
    val out = Similarity.semanticContaminationIvf(train, df(bench),
      threshold = 0.9, nLists = 2, iters = 4)
    // every cluster-A vector is within cos 0.9 of the bench probe; no
    // cluster-B vector is — and the result equals the broadcast truth
    assert(contamRows(out) ===
      contamRows(Similarity.semanticContamination(train, df(bench), 0.9)))
    assert(out.count() === 10)
    graft.ops.Caching.releaseAll(spark)
  }

  // ------------------------------------------------------- dsirResample

  test("dsirResample shifts the selected set toward the target distribution") {
    import graft.text.TextFeatures
    // pool: 30 target-looking docs + 30 off-target docs of equal length;
    // weight-proportional selection of 20 must overwhelmingly pick the
    // target-looking ones (their importance weight is exp(~hundreds of
    // micronats) larger), measurably shifting the selected-set mean weight
    // above the pool mean
    val a = (1 to 20).map(i => s"alpha$i").mkString(" ")
    val b = (1 to 20).map(i => s"omega$i").mkString(" ")
    val docs = df(
      (1 to 5).map(i => Doc(i.toLong, a, "tgt", "s", a.length.toLong)) ++
      (10 to 39).map(i => Doc(i.toLong, a, "en", "s", a.length.toLong)) ++
      (40 to 69).map(i => Doc(i.toLong, b, "en", "s", b.length.toLong)))
    val isTarget = col("lang") === "tgt"
    val sel = TextFeatures.dsirResample(docs, isTarget, keep = 20)
    val selIds = sel.collect().map(_.getAs[Long]("doc_id")).toSet
    assert(selIds.size === 20)
    // selection is from the POOL only (target rows score, never selected)
    assert(selIds.forall(_ >= 10L))
    val targetLooking = selIds.count(_ < 40L)
    assert(targetLooking >= 18,
      s"expected the A-vocabulary pool docs to dominate, got $targetLooking/20")
    // the mean selected weight must exceed the pool mean (the shift the
    // resampling exists to produce)
    val poolMean = TextFeatures.dsirWeights(docs, isTarget)
      .agg(avg("w_micronats")).head().getDouble(0)
    val selMean = sel.agg(avg("w_micronats")).head().getDouble(0)
    assert(selMean > poolMean)
    graft.ops.Caching.releaseAll(spark)
  }

  test("dsirResample is deterministic and replays the weights it selects by") {
    val emb = graft.tables.Tables.load(spark, sf, "documents")
    val run1 = TextFeatures.dsirResample(emb, col("lang") === "en", keep = 25)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("w_micronats"), r.getAs[Long]("g_micronats"),
        r.getAs[Long]("score_micronats"))).toSet
    val run2 = TextFeatures.dsirResample(emb, col("lang") === "en", keep = 25)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("w_micronats"), r.getAs[Long]("g_micronats"),
        r.getAs[Long]("score_micronats"))).toSet
    assert(run1 === run2)
    assert(run1.size === 25)
    // the selection key is the exact long sum of its parts
    assert(run1.forall { case (_, w, g, s) => w + g === s })
    graft.ops.Caching.releaseAll(spark)
  }

  // ----------------------------------------------------------- diverseSubset

  test("diverseSubset: every occupied cell represented, counts round-robin balanced") {
    val emb = graft.tables.Tables.load(spark, sf, "embeddings")
    val full = Similarity.diverseSubset(emb, n = Int.MaxValue, nLists = 4,
      iters = 2)
    val cellTotals = full.groupBy("cell").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val n = 10
    val sel = Similarity.diverseSubset(emb, n = n, nLists = 4, iters = 2)
      .groupBy("cell").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sel.values.sum === n.toLong)
    // n >= #occupied cells -> every occupied cell appears
    assert(sel.keySet === cellTotals.keySet)
    // exact round-robin: a cell's count may lag the max only if exhausted
    val maxCount = sel.values.max
    sel.foreach { case (cell, cnt) =>
      assert(cnt >= maxCount - 1 || cnt === cellTotals(cell),
        s"cell $cell: selected $cnt of ${cellTotals(cell)}, max $maxCount")
    }
  }

  test("diverseSubset: rank-1 representatives are each cell's closest-to-centroid member") {
    val emb = graft.tables.Tables.load(spark, sf, "embeddings")
    val full = Similarity.diverseSubset(emb, n = Int.MaxValue, nLists = 4,
      iters = 2).persist()
    val minDist = full.groupBy("cell").agg(min("dist_micro").as("md"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val rank1 = full.filter(col("rep_rank") === 1L).collect()
    assert(rank1.map(_.getAs[Int]("cell")).toSet === minDist.keySet)
    rank1.foreach { r =>
      assert(r.getAs[Long]("dist_micro") === minDist(r.getAs[Int]("cell")))
    }
    full.unpersist()
  }
}
