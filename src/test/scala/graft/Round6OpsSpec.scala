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

  private def doc(id: Long, text: String) =
    Doc(id, text, "en", "src0", text.length.toLong)

  test("contaminationReport flags exactly the docs sharing an n-gram") {
    val bench = df(Seq(doc(100, "alpha beta gamma delta epsilon zeta")))
    val train = df(Seq(
      doc(1, "prefix words then alpha beta gamma delta inline tail"), // shares the 4-gram
      doc(2, "completely different tokens with no shared span at all"),
      doc(3, "alpha beta gamma delta epsilon zeta")))                 // exact copy
    val rep = graft.text.Decontam.contaminationReport(train, bench, n = 4)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rep(1L).getAs[Boolean]("is_contaminated"))
    assert(rep(1L).getAs[Long]("n_contaminated") === 1L) // only the one 4-gram
    assert(!rep(2L).getAs[Boolean]("is_contaminated"))
    assert(rep(2L).getAs[Double]("contamination_ratio") === 0.0)
    assert(rep(3L).getAs[Boolean]("is_contaminated"))
    assert(rep(3L).getAs[Long]("n_contaminated") ===
      rep(3L).getAs[Long]("n_ngrams")) // every gram of the copy is in bench
    val kept = graft.text.Decontam.decontaminate(train, bench, n = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L))
  }

  test("boilerplateRatio scores planted boilerplate, clean docs at zero") {
    val chrome = "subscribe to our newsletter"
    val docs = df((1L to 8L).map(i =>
      doc(i, s"unique body $i with its own words $i $i then $chrome")) :+
      doc(9, "a clean document with entirely original phrasing throughout"))
    val rep = graft.text.Decontam.boilerplateRatio(docs, n = 3, minDocs = 5)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    (1L to 8L).foreach { i =>
      assert(rep(i).getAs[Long]("n_boiler") >= 2L, s"doc $i") // the chrome 3-grams
      assert(rep(i).getAs[Double]("boiler_ratio") > 0.0)
    }
    assert(rep(9L).getAs[Long]("n_boiler") === 0L)
    assert(rep(9L).getAs[Double]("boiler_ratio") === 0.0)
    val frequent = graft.text.Decontam.boilerplateNgrams(docs, n = 3, minDocs = 5)
      .collect().map(_.getString(0)).toSet
    // both chrome 3-grams survive the frequency cut; nothing unique does
    assert(frequent.contains("subscribe to our") &&
      frequent.contains("to our newsletter"))
    assert(!frequent.exists(_.contains("unique")))
  }

  test("banded minhash equals brute force on reseeded near-threshold corpora") {
    // the q24/q43/q169 oracles assert LSH == brute force; this pins that
    // equality on REGENERATED corpora with many pairs near the 0.8
    // threshold (the driver can reseed testdata between rounds). At the
    // default 128 perms / 32 bands the per-pair miss probability at
    // j = 0.8 is ~5e-8 — hundreds of planted pairs over several seeds
    // stay comfortably below any flake risk.
    val vocab = Vector("key", "agg", "row", "scan", "slow", "fast", "table",
      "value", "part", "hash", "merge", "batch", "spark", "window", "order",
      "data", "column", "join", "small", "line", "customer", "query", "big",
      "the", "sort", "group", "stream", "filter", "vector", "a")
    for (seed <- Seq(11, 23)) {
      val rnd = new scala.util.Random(seed)
      val docs = (0 until 60).flatMap { fam =>
        val len = 20 + rnd.nextInt(40)
        val base = Vector.fill(len)(vocab(rnd.nextInt(vocab.size)))
        val variants = (0 until 1 + rnd.nextInt(2)).map { v =>
          val nMut = 1 + rnd.nextInt(4)
          val mutated = (0 until nMut).foldLeft(base) { (b, _) =>
            b.updated(rnd.nextInt(len), vocab(rnd.nextInt(vocab.size)))
          }
          doc(fam * 10L + v + 1L, mutated.mkString(" "))
        }
        doc(fam * 10L, base.mkString(" ")) +: variants
      }
      val d = df(docs)
      val got = graft.text.Dedup.minhashNearDupsShingle(d, threshold = 0.8)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val sh = graft.text.Dedup.shingleSets(d)
      val brute = sh.as("x").join(sh.as("y"), col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
          size(array_intersect(col("x.s"), col("y.s"))).cast("double").as("i"),
          (size(col("x.s")) + size(col("y.s"))).cast("double").as("ab"))
        .filter(when(col("ab") - col("i") === 0, lit(1.0))
          .otherwise(col("i") / (col("ab") - col("i"))) >= 0.8)
        .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(brute.nonEmpty, s"seed $seed planted no near-dup pairs")
      assert(got === brute, s"seed $seed: banded != brute force")
    }
  }

  test("pageRankInt matches the hand-computed star graph, releases caches") {
    graft.ops.Caching.releaseAll(spark)
    // star: 1-2, 1-3, 1-4. r0 = 1e6 everywhere. Round 1:
    //   share(1) = 1e6 div 3 = 333333; share(leaf) = 1e6
    //   rank(1)    = 150000 + (85 * 3e6)    div 100 = 2700000
    //   rank(leaf) = 150000 + (85 * 333333) div 100 = 433333
    val pairs = df(Seq(R5Pair(1, 2), R5Pair(1, 3), R5Pair(1, 4)))
    val r1 = graft.ops.Graph.pageRankInt(pairs, "probe_id", "neighbor_id",
      iters = 1)
    val m1 = r1.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m1 === Map(1L -> 2700000L, 2L -> 433333L, 3L -> 433333L, 4L -> 433333L))
    graft.ops.Caching.release(r1)
    val r4 = graft.ops.Graph.pageRankInt(pairs, "probe_id", "neighbor_id",
      iters = 4)
    val m4 = r4.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // center keeps dominating; total mass stays near scale * |V| (truncation
    // only sheds sub-ppm mass per round)
    assert(m4(1L) > m4(2L) && m4(2L) === m4(3L) && m4(3L) === m4(4L))
    assert(math.abs(m4.values.sum - 4000000L) < 20000L)
    graft.ops.Caching.release(r4)
    assert(spark.sharedState.cacheManager.isEmpty,
      "releasing the result must reclaim every cache entry the call created")
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
