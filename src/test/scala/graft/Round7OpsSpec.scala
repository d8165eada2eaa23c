package graft

import org.apache.spark.sql.functions._

import graft.text.TextStats

case class R7Doc(doc_id: Long, text: String)

/** Round-7 operator specs: the Gopher/MassiveText rule bundle and the
  * n-gram repetition signals, each rule exercised at its boundary. */
class Round7OpsSpec extends SparkSpec {

  private def profile(docs: Seq[R7Doc]) =
    TextStats.gopherQualityProfile(df(docs), minWords = 10)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

  test("gopher rules: a clean document passes every rule") {
    val clean = ("the quick brown fox jumps over the lazy dog and " * 3) +
      "that was all of it with room to spare"
    val p = profile(Seq(R7Doc(1, clean)))(1L)
    for (rule <- Seq("words_ok", "mean_len_ok", "symbol_ok", "alpha_ok",
      "stop_ok", "lines_ok", "pass_gopher"))
      assert(p.getAs[Boolean](rule), rule)
  }

  test("gopher rules: each violation trips exactly its own rule") {
    val docs = Seq(
      R7Doc(2, "too short to count the of"), // 6 words < 10
      R7Doc(3, Seq.fill(12)("a").mkString(" ") + " the of"), // mean len < 3
      R7Doc(4, "the of " + Seq.fill(12)("####word").mkString(" ")), // symbols
      R7Doc(5, "the of " + (1 to 12).map(_.toString).mkString(" ")), // digits
      R7Doc(6, Seq.fill(12)("detail").mkString(" "))) // no stop words
    val p = profile(docs)
    assert(!p(2L).getAs[Boolean]("words_ok") && p(2L).getAs[Boolean]("stop_ok"))
    assert(!p(3L).getAs[Boolean]("mean_len_ok") && p(3L).getAs[Boolean]("words_ok"))
    assert(!p(4L).getAs[Boolean]("symbol_ok") && p(4L).getAs[Boolean]("alpha_ok"))
    assert(!p(5L).getAs[Boolean]("alpha_ok") && p(5L).getAs[Boolean]("symbol_ok"))
    assert(!p(6L).getAs[Boolean]("stop_ok") && p(6L).getAs[Boolean]("mean_len_ok"))
    assert(docs.map(_.doc_id).forall(id => !p(id).getAs[Boolean]("pass_gopher")))
  }

  test("gopher rules: bullet-dominated lines fail the line rule") {
    val bullets = (1 to 10).map(i => s"- bullet item number $i of the list")
      .mkString("\n")
    val p = profile(Seq(R7Doc(7, bullets)))(7L)
    assert(!p.getAs[Boolean]("lines_ok"))
    assert(p.getAs[Boolean]("words_ok")) // 10 x 7 words clears the floor
  }

  test("containmentNearDups flags an embedded quote that Jaccard misses") {
    val quote = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val page = quote + " " + (1 to 40).map(i => s"word$i").mkString(" ")
    val docs = df(Seq(
      R7Doc(1, quote),                       // fully contained in 2
      R7Doc(2, page),
      R7Doc(3, "completely unrelated text about nothing in particular here")))
    val out = graft.text.Dedup.containmentNearDups(docs, threshold = 0.9)
      .collect()
    assert(out.length === 1)
    val r = out(0)
    assert(r.getAs[Long]("doc_a") === 1L && r.getAs[Long]("doc_b") === 2L)
    // every shingle of the quote appears in the page -> containment 1.0
    assert(r.getAs[Double]("containment_a") === 1.0)
    assert(r.getAs[Double]("containment_b") < 0.9)
    // ...while symmetric Jaccard sits far below any dedup threshold
    val jac = graft.text.Dedup.minhashNearDupsShingle(docs, threshold = 0.8)
    assert(jac.count() === 0, "Jaccard dedup must NOT pair quote and page")
  }

  test("containmentNearDups DF prune drops corpus-frequent boilerplate grams") {
    // the same boilerplate shingle in every doc; maxDf=2 prunes it, so the
    // only surviving overlap evidence is the genuine shared tail of 4/5
    val boiler = "copyright example corp all rights reserved"
    val docs = df(Seq(
      R7Doc(4, boiler + " unique four text"),
      R7Doc(5, boiler + " entirely different content"),
      R7Doc(6, boiler + " more unrelated words"),
      R7Doc(7, boiler + " shared tail of tokens here"),
      R7Doc(8, boiler + " shared tail of tokens there")))
    val out = graft.text.Dedup.containmentNearDups(docs,
        threshold = 0.5, maxDf = 2).collect()
    // boilerplate grams (df=5) pruned: only 7/8 share enough post-prune
    assert(out.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
      === Set((7L, 8L)))
  }

  test("mmrRerank prefers diverse picks over redundant near-duplicates") {
    // probe near axis 0; candidates: two near-identical high-relevance
    // vectors (1, 2), one moderately relevant diverse vector (3), junk (4).
    // Pure relevance ranks (1, 2, 3); MMR must interleave: pick 1, then the
    // DIVERSE 3 (2's sim-to-1 penalty sinks it), then 2.
    val vecs = Seq(
      Vec(100, Array(1f, 0f, 0f, 0f), 0), // probe
      Vec(1, Array(0.99f, 0.14f, 0f, 0f), 0),
      Vec(2, Array(0.99f, 0.141f, 0f, 0f), 0), // near-dup of 1
      Vec(3, Array(0.7f, 0f, 0.7f, 0f), 0),    // diverse, decent relevance
      Vec(4, Array(0f, 0.1f, 0f, 1f), 0))      // barely relevant
    val d = df(vecs)
    val picks = graft.sim.Similarity.mmrRerank(
        d, d.filter(col("vec_id") === 100), n = 4, k = 3)
      .orderBy("mmr_rank").collect().map(_.getAs[Long]("neighbor_id"))
    assert(picks === Array(1L, 3L, 2L),
      s"expected diversity-aware order, got ${picks.mkString(",")}")
    // rank-respecting: scores are non-increasing is NOT guaranteed by MMR,
    // but the first pick must be the pure-relevance argmax
    val rel = graft.sim.Similarity.bruteForceTopK(
        d, d.filter(col("vec_id") === 100), 1)
      .collect()(0).getAs[Long]("neighbor_id")
    assert(picks(0) === rel)
  }

  test("saved ANN index serves identically to the freshly-built one") {
    import graft.sim.Similarity
    val emb = graft.tables.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val probes = emb.filter(col("vec_id") < 5)
    val ivf = Similarity.ivfBuild(emb, nLists = 8)
    val pq = Similarity.pqBuild(emb, codesPerSub = 16)
    val dir = java.nio.file.Files.createTempDirectory("graft-index").toString
    val lake = new graft.tables.LakeTable(spark, dir)
    Similarity.saveIndex(lake, "ann", ivf, pq)
    val (ivf2, pq2) = Similarity.loadIndex(lake, "ann")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(rows(Similarity.ivfTopK(ivf2, probes, 3, nProbe = 4)) ===
      rows(Similarity.ivfTopK(ivf, probes, 3, nProbe = 4)))
    assert(rows(Similarity.ivfPqTopK(ivf2, pq2, probes, 3, nProbe = 4)) ===
      rows(Similarity.ivfPqTopK(ivf, pq, probes, 3, nProbe = 4)))
    // the layout earns its keep: a one-cell read prunes at the partition
    // level, not with a post-scan filter
    val one = lake.read("ann_ivf_vectors").filter(col("cell") === 0)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(cell"),
      s"cell filter must prune partitions:\n${plan.take(500)}")
    graft.ops.Caching.releaseAll(spark)
  }

  test("topNgramCharFraction: counts, ties and the documented overlap contract") {
    val out = TextStats.topNgramCharFraction(
        df(Seq(R7Doc(1, "x y x y x y"), R7Doc(2, "b a c"))))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc 1: grams "x y" x3, "y x" x2; norm length 11
    val d1 = out(1L)
    assert(d1.getAs[String]("top_gram") === "x y")
    assert(d1.getAs[Long]("n_occurrences") === 3L)
    assert(d1.getAs[Double]("top_char_fraction") === math.round(3.0 * 3 / 11 * 1e6) / 1e6)
    // overlapping occurrences each count: (3 + 2) grams x 3 chars / 11
    assert(d1.getAs[Double]("dup_char_fraction") === math.round(15.0 / 11 * 1e6) / 1e6)
    // doc 2: all grams unique -> count 1, ties break lexicographically
    val d2 = out(2L)
    assert(d2.getAs[String]("top_gram") === "a c")
    assert(d2.getAs[Long]("n_occurrences") === 1L)
    assert(d2.getAs[Double]("dup_char_fraction") === 0.0)
  }
}
