package graft

import org.apache.spark.sql.functions._

import graft.ops.Analytics
import graft.sim.Similarity
import graft.text.{Dedup, TextFeatures}

case class R5Row(k: Long, v: Long)
case class R5Pair(probe_id: Long, neighbor_id: Long)
case class R5Ranked(probe_id: Long, neighbor_id: Long, rn: Int)
case class R5Vec(vec_id: Long, embedding: Array[Float], label: Int)

/** Round-5 operators: two-level prefix sums / ntile arithmetic, the
  * shingle-verified MinHash family, portable SimHash, portable TF-IDF, and
  * the ANN recall/rank gates. */
class Round5OpsSpec extends SparkSpec {

  test("globalPrefixSums matches a single global window") {
    import org.apache.spark.sql.expressions.Window
    val rows = (1L to 500L).map(i => R5Row(i * 7919L % 501L, i % 13L))
    val d = df(rows)
    val got = Analytics.globalPrefixSums(d, floor(col("k") / lit(50L)),
        Seq(col("k").asc, col("v").asc), Seq("v" -> col("v"), "one" -> lit(1L)))
      .select(col("k"), col("v"), col("cum_v"), col("cum_one"),
        col("total_v"), col("total_one"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val w = Window.orderBy(col("k").asc, col("v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = d.select(col("k"), col("v"),
        sum(col("v")).over(w).as("cv"), count(lit(1)).over(w).as("co"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val totV = rows.map(_.v).sum
    want.foreach { case (key, (cv, co)) =>
      val (gcv, gco, gtv, gto) = got(key)
      assert(gcv === cv && gco === co, s"key $key")
      assert(gtv === totV && gto === rows.size.toLong)
    }
  }

  test("ntileFromRank reproduces SQL ntile for ragged bucket splits") {
    import org.apache.spark.sql.expressions.Window
    for (n <- Seq(3, 10, 23, 40)) {
      val d = df((1L to n.toLong).map(i => R5Row(i, i)))
      val want = d.select(col("k"),
          ntile(4).over(Window.orderBy("k")).as("nt"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val got = d.select(col("k"),
          Analytics.ntileFromRank(col("k"), lit(n.toLong), 4).as("nt"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got === want, s"n=$n")
    }
  }

  private def doc(id: Long, text: String) =
    Doc(id, text, "en", "src0", text.length.toLong)

  private val corpus = Seq(
    doc(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    doc(2, "alpha beta gamma delta epsilon zeta eta theta iota lambda"), // near-dup of 1
    doc(3, "one two three four five six seven eight nine ten"),
    doc(4, "totally unrelated content about distributed query engines"),
    doc(5, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))   // exact dup of 1

  test("minhashNearDupsShingle finds planted near-dups, skips unrelated") {
    val pairs = Dedup.minhashNearDupsShingle(df(corpus), threshold = 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 5L)) && pairs.contains((2L, 5L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L || p._1 == 4L || p._2 == 4L))
  }

  test("minhashNearDupsShingle equals brute-force shingle jaccard") {
    val got = Dedup.minhashNearDupsShingle(df(corpus), threshold = 0.5)
      .select("doc_a", "doc_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val sh = Dedup.shingleSets(df(corpus))
    val brute = sh.as("x").join(sh.as("y"), col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        size(array_intersect(col("x.s"), col("y.s"))).cast("double").as("i"),
        (size(col("x.s")) + size(col("y.s"))).cast("double").as("ab"))
      .select(col("a"), col("b"),
        when(col("ab") - col("i") === 0, lit(1.0))
          .otherwise(col("i") / (col("ab") - col("i"))).as("j"))
      .filter(col("j") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === brute)
  }

  test("dedupCorpusShingle keeps one canonical doc per near-dup cluster") {
    val kept = Dedup.dedupCorpusShingle(df(corpus), threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // 5 is an exact dup of 1 (dropped); 1-2 cluster keeps min id 1
    assert(kept === Set(1L, 3L, 4L))
  }

  test("simhash emits portable 60-bit fingerprints; dups share them") {
    val fps = Dedup.simhash(df(corpus)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    fps.values.foreach(fp => assert(fp >= 0L && fp < (1L << 60)))
    assert(fps(1L) === fps(5L)) // identical text, identical fingerprint
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fps(1L), fps(2L)) < ham(fps(1L), fps(4L)))
  }

  test("tfidfEmbeddingsPortable: dense width, identical docs get cosine 1") {
    val emb = TextFeatures.tfidfEmbeddingsPortable(df(corpus), numFeatures = 64)
    val rows = emb.collect().map(r =>
      r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(rows.size === 5 && rows.values.forall(_.length === 64))
    assert(rows(1L) === rows(5L))
    val top = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") === 1), 1)
      .collect()(0)
    assert(top.getAs[Long]("neighbor_id") === 5L)
    assert(math.abs(top.getAs[Double]("cos_sim") - 1.0) < 1e-12)
  }

  

  test("recallGate pins anchors and the recall boolean") {
    val exact = df(Seq(R5Pair(1, 10), R5Pair(1, 11), R5Pair(2, 10), R5Pair(2, 12)))
    val good = Similarity.recallGate(exact, exact, minRecall = 0.99).collect()(0)
    assert(good.getAs[Long]("n_probes") === 2L)
    assert(good.getAs[Long]("n_exact_pairs") === 4L)
    assert(good.getAs[Boolean]("recall_ok"))
    val half = df(Seq(R5Pair(1, 10), R5Pair(1, 99), R5Pair(2, 10), R5Pair(2, 99)))
    assert(!Similarity.recallGate(exact, half, minRecall = 0.75)
      .collect()(0).getAs[Boolean]("recall_ok"))
    assert(Similarity.recallGate(exact, half, minRecall = 0.5)
      .collect()(0).getAs[Boolean]("recall_ok"))
  }

  test("charBigramLogScore: rare character sequences score higher") {
    import graft.text.TextStats
    val docs = Seq(
      doc(1, "the cat sat on the mat"),
      doc(2, "the cat sat on the hat"),
      doc(3, "the bat sat on the mat"),
      doc(4, "zzqx jjvv wwkk qqzz"))  // alien char distribution
    val scores = TextStats.charBigramLogScore(df(docs)).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("avg_neg_logp")).toMap
    assert(scores(4L) > scores(1L) && scores(4L) > scores(2L) && scores(4L) > scores(3L))
    // micronat accumulation: score is finite and positive
    scores.values.foreach(s => assert(s > 0.0 && s < 20.0))
  }

  test("sourceLengthBands: outliers land outside the band, census adds up") {
    import graft.text.TextStats
    val docs = (1L to 40L).map(i => Doc(i, ("w " * 50).trim, "en", "s0", 100L)) ++
      Seq(Doc(98L, "w", "en", "s0", 1L),
        Doc(99L, ("w " * 500).trim, "en", "s0", 999L))
    val r = TextStats.sourceLengthBands(df(docs)).collect()(0)
    assert(r.getAs[Long]("n_docs") === 42L)
    assert(r.getAs[Long]("n_too_short") === 1L)
    assert(r.getAs[Long]("n_too_long") === 1L)
    assert(r.getAs[Long]("n_kept") === 40L)
  }

  test("splitTokenDrift: identical halves drift ~0, disjoint halves ~ln 2") {
    import graft.text.TextStats
    // doc_ids chosen so md5 first nibble splits them: find ids per nibble
    val evalIds = (1L to 400L).filter(i =>
      "01".contains(org.apache.commons.codec.digest.DigestUtils.md5Hex(i.toString).charAt(0)))
    val trainIds = (1L to 400L).filterNot(evalIds.contains)
    // same text both sides -> near-zero drift
    val same = (evalIds.take(10) ++ trainIds.take(10)).map(i =>
      Doc(i, "alpha beta gamma delta", "en", "s0", 10L))
    val dSame = TextStats.splitTokenDrift(df(same)).collect()(0)
    assert(dSame.getAs[Double]("js_nats") < 0.01)
    // disjoint vocabularies -> maximal drift ln 2
    val disj = evalIds.take(10).map(i => Doc(i, "aaa bbb ccc", "en", "s0", 10L)) ++
      trainIds.take(10).map(i => Doc(i, "xxx yyy zzz", "en", "s0", 10L))
    val dDisj = TextStats.splitTokenDrift(df(disj)).collect()(0)
    assert(math.abs(dDisj.getAs[Double]("js_nats") - math.log(2.0)) < 0.01)
  }

  test("whitening turns correlated embeddings into identity covariance") {
    // strongly correlated 4-dim vectors: dim1 = 2*dim0 + noise, etc.
    val rnd = new scala.util.Random(7)
    val vecs = (1L to 300L).map { i =>
      val a = rnd.nextGaussian(); val b = rnd.nextGaussian()
      val c = rnd.nextGaussian(); val e = rnd.nextGaussian()
      // correlated but FULL-RANK (4 independent noise sources for 4 dims):
      // an exactly-singular direction would whiten pure float noise (the
      // documented eps caveat)
      R5Vec(i,
        Array(a, 2 * a + 0.3 * b + 0.2 * e, b, a + b + 0.3 * c).map(_.toFloat), 0)
    }
    val d = df(vecs)
    val gate = Similarity.whitenGate(d, tol = 0.05).collect()(0)
    assert(gate.getAs[Long]("n_vectors") === 300L)
    assert(gate.getAs[Int]("dim") === 4)
    assert(gate.getAs[Boolean]("diag_ok") && gate.getAs[Boolean]("offdiag_ok"))
    // the ORIGINAL covariance is far from identity (dim0/dim1 corr ~ 1)
    import org.apache.spark.sql.functions.{corr, element_at}
    val c01 = d.select(corr(
      element_at(col("embedding"), 1).cast("double"),
      element_at(col("embedding"), 2).cast("double"))).head().getDouble(0)
    assert(c01 > 0.9)
  }

  test("BPE trainer merges the most frequent pair first, deterministically") {
    import graft.text.Bpe
    val freq = Seq("abab" -> 10L, "abc" -> 5L, "zz" -> 1L)
    val merges = Bpe.trainMerges(freq, 2)
    // 'ab' dominates (10*3 + 5*1 adjacencies start from chars: pair (a,b)
    // has freq 10*2 + 5 = 25, the max)
    assert(merges.head === ("a", "b"))
    val counts = Bpe.segmentCounts(Seq("abab", "abc", "zz"), merges)
    assert(counts("abab") <= 2) // 'ab' merged; second merge may fuse further
    assert(counts("zz") <= 2)
    counts.foreach { case (w, c) => assert(c >= 1 && c <= w.length) }
  }

  test("bpeCompressionStats: bounds hold and repeated text compresses") {
    import graft.text.Bpe
    val docs = Seq(
      doc(1, "the the the the cat cat cat"),
      doc(2, "the cat the cat the cat"),
      doc(3, "xyzzy qwerty"))
    val stats = Bpe.bpeCompressionStats(df(docs), vocabCap = 10, numMerges = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_bpe_tokens"))).toMap
    stats.foreach { case (_, (nt, nb)) => assert(nb >= nt) }
    // 'the' and 'cat' fully merge to one BPE token each
    assert(stats(1L)._2 === stats(1L)._1)
    val gate = Bpe.bpeGate(df(docs), vocabCap = 10, numMerges = 8).collect()(0)
    assert(gate.getAs[Boolean]("bpe_ge_tokens"))
    assert(gate.getAs[Boolean]("bpe_compresses"))
  }

  test("corpusReportCard aggregates hygiene, volume, and language mix") {
    val docs = Seq(
      Doc(1, "alpha beta gamma", "en", "s0", 10L),
      Doc(2, "alpha beta gamma", "en", "s0", 10L), // exact dup of 1
      Doc(3, "uno dos tres cuatro", "es", "s0", 10L),
      Doc(4, "one two three", "en", "s1", 10L))
    val card = graft.text.Refinery.corpusReportCard(df(docs))
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val s0 = card("s0")
    assert(s0.getAs[Long]("n_docs") === 3L)
    assert(s0.getAs[Long]("n_exact_dups") === 1L)
    assert(s0.getAs[Long]("n_langs") === 2L)
    assert(s0.getAs[String]("top_lang") === "en")
    assert(s0.getAs[Long]("total_tokens") === 10L)
    assert(card("s1").getAs[Long]("n_exact_dups") === 0L)
  }

  test("adcRankGate bounds the mean full-ranking position of truth pairs") {
    val exact = df(Seq(R5Pair(1, 10), R5Pair(1, 11)))
    val full = df(Seq(R5Ranked(1, 10, 1), R5Ranked(1, 11, 7), R5Ranked(1, 12, 2)))
    val corpus = df((1L to 20L).map(i => R5Row(i, i)))
    // avg rank 4 over corpus 20: frac 0.2 passes at 0.25, fails at 0.15
    assert(Similarity.adcRankGate(exact, full, corpus, 0.25)
      .collect()(0).getAs[Boolean]("rank_ok"))
    assert(!Similarity.adcRankGate(exact, full, corpus, 0.15)
      .collect()(0).getAs[Boolean]("rank_ok"))
  }
}
