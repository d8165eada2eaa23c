package graft

import org.apache.spark.sql.functions._

import graft.sim.Similarity

case class R6Vec(vec_id: Long, embedding: Array[Float], label: Int)

/** Round-6 operators: the un-ranked PQ gate and cache-contract behaviors. */
class Round6OpsSpec extends SparkSpec {

  private def corpus = df((1L to 120L).map { i =>
    R6Vec(i, Array.tabulate(16)(j =>
      (math.sin(i * 0.37 + j * 1.13) + math.cos(i * j * 0.05)).toFloat),
      (i % 3L).toInt)
  })

  test("pqGate equals the materialized-full-ranking gates") {
    val emb = corpus
    val probes = emb.filter(col("vec_id") <= 5)
    val pq = Similarity.pqBuild(emb, m = 4, codesPerSub = 8)
    val exact = Similarity.bruteForceTopK(emb, probes, 3)
    // reference path: full ADC ranking, then the two separate gates
    val full = Similarity.pqTopK(pq, probes, Int.MaxValue)
    for (frac <- Seq(0.05, 0.25, 0.75); minRecall <- Seq(0.05, 0.5, 0.95)) {
      val want = Similarity.recallGate(exact,
          full.filter(col("rn") <= 3), minRecall)
        .crossJoin(Similarity.adcRankGate(exact, full, emb, frac))
        .collect()(0)
      val got = Similarity.pqGate(pq, probes, exact, emb,
        k = 3, minRecall = minRecall, maxAvgRankFrac = frac).collect()(0)
      assert(got.getAs[Long]("n_probes") === want.getAs[Long]("n_probes"))
      assert(got.getAs[Long]("n_exact_pairs") === want.getAs[Long]("n_exact_pairs"))
      assert(got.getAs[Boolean]("recall_ok") === want.getAs[Boolean]("recall_ok"),
        s"recall_ok diverged at minRecall=$minRecall")
      assert(got.getAs[Boolean]("rank_ok") === want.getAs[Boolean]("rank_ok"),
        s"rank_ok diverged at frac=$frac")
    }
  }

  test("connectedComponents leaves only its own releasable cache entry") {
    graft.ops.Caching.releaseAll(spark)
    val pairs = df(Seq(R5Pair(1, 2), R5Pair(2, 3), R5Pair(10, 11)))
    val out = graft.ops.Graph.connectedComponents(pairs, "probe_id", "neighbor_id")
    assert(out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    // no RDD-level blocks (the GraphX leak class), exactly one SQL entry
    assert(spark.sparkContext.getPersistentRDDs.count(_._2.getStorageLevel.useMemory) <= 1)
    graft.ops.Caching.release(out)
    assert(spark.sharedState.cacheManager.isEmpty,
      "releasing the result must reclaim every cache entry the call created")
  }

  test("reachableParts drops its view and releases all but its result") {
    graft.ops.Caching.releaseAll(spark)
    val pairs = df(Seq(R5Pair(1, 2), R5Pair(2, 3))).toDF("part_a", "part_b")
    val out = graft.ops.Analytics.reachableParts(spark, pairs, maxHops = 2)
    assert(out.count() === 3)
    assert(!spark.catalog.listTables().collect()
      .exists(_.name.startsWith("graft_reach_pairs_")), "temp view leaked")
    graft.ops.Caching.release(out)
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  test("triangleCount releases its edge cache after materializing") {
    graft.ops.Caching.releaseAll(spark)
    val edges = df(Seq(R5Pair(1, 2), R5Pair(2, 3), R5Pair(1, 3), R5Pair(3, 4)))
      .toDF("part_a", "part_b")
    val out = graft.ops.Graph.triangleCount(edges)
    val r = out.collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((4L, 4L, 1L)))
    graft.ops.Caching.release(out)
    assert(spark.sharedState.cacheManager.isEmpty)
  }
}
