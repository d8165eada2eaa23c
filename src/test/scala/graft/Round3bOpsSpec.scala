package graft

import org.apache.spark.sql.functions._

import graft.ops.Analytics
import graft.sim.Similarity

/** Late round-3 operators: deterministic group mode, equi-width histograms,
  * embedding quantization, share-of-total, schema-drift unions. */
class Round3bOpsSpec extends SparkSpec {

  import spark.implicits._

  test("groupMode picks the most frequent value, smallest value on ties") {
    val df = Seq(
      ("g1", "b"), ("g1", "b"), ("g1", "a"),          // b wins on count
      ("g2", "z"), ("g2", "y"),                       // tie -> y (smallest)
      ("g3", "only")).toDF("grp", "v")
    val out = Analytics.groupMode(df, "grp", "v")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(out === Set(("g1", "b", 2L), ("g2", "y", 1L), ("g3", "only", 1L)))
  }

  test("groupMode is deterministic under repartitioning") {
    val df = Seq.tabulate(1000)(i => (i % 7, s"v${i % 3}")).toDF("grp", "v")
    val a = Analytics.groupMode(df, "grp", "v").collect().toSet
    val b = Analytics.groupMode(df.repartition(13), "grp", "v").collect().toSet
    assert(a === b)
  }

  test("equiWidthHistogram buckets by floor division and covers all rows") {
    val df = Seq(0.0, 12.5, 24.99, 25.0, 49.9, 110.0).toDF("x")
    val out = Analytics.equiWidthHistogram(df, "x", 25.0)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(out === Map(0 -> 3L, 1 -> 2L, 4 -> 1L))
  }

  test("quantizeCodes maps min->0, max->255, constant vectors to zero") {
    val df = Seq(
      (1L, Seq(0.0f, 0.5f, 1.0f)),
      (2L, Seq(3.0f, 3.0f, 3.0f))).toDF("vec_id", "embedding")
    val rows = df.select($"vec_id", Similarity.quantizeCodes($"embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(rows(1L) === Seq(0, 128, 255))
    assert(rows(2L) === Seq(0, 0, 0))
  }

  test("quantizeStats matches codes computed on the driver") {
    val vecs = Seq.tabulate(50)(i =>
      (i.toLong, Seq.tabulate(16)(j => ((i * 31 + j * 7) % 101).toFloat / 10f)))
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.quantizeStats(df).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getInt(3), r.getInt(4))))
      .toMap
    vecs.foreach { case (id, v) =>
      val mn = v.min.toDouble; val mx = v.max.toDouble
      val codes = v.map(x =>
        if (mx == mn) 0
        else math.min(255L, math.floor((x.toDouble - mn) / (mx - mn) * 256.0).toLong).toInt)
      assert(got(id) === ((16, codes.map(_.toLong).sum, codes.min, codes.max)),
        s"vec $id")
    }
  }

  test("revenueShareBySegment shares sum to ~1 and weight exact cents") {
    val fact = Seq(
      ("A", 10.004), ("A", 20.0), ("B", 30.01), ("C", 39.99)
    ).toDF("c_mktsegment", "revenue")
    val out = Analytics.revenueShareBySegment(fact).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(out("A")._1 === 30.0)   // 10.00 + 20.00 in integer cents
    assert(out("B")._1 === 30.01)
    assert(math.abs(out.values.map(_._2).sum - 1.0) < 1e-6)
    assert(out("C")._2 === math.rint(39.99 / 100.0 * 1e6) / 1e6)
  }

  test("crossSplitContamination finds planted n-gram overlap only") {
    // doc 7 hashes to an eval nibble? Build explicitly: pick ids whose
    // md5 first nibble is in/out of the eval set.
    def nib(id: Long) = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      "%02x".format(d(0)).substring(0, 1)
    }
    val evalId = (1L to 200L).find(i => "01".contains(nib(i))).get
    val cleanId = (1L to 200L).find(i => "01".contains(nib(i)) && i != evalId).get
    val trainId = (1L to 200L).find(i => !"01".contains(nib(i))).get
    val shared = (1 to 8).map(i => s"tok$i").mkString(" ")
    val df = Seq(
      (evalId, s"$shared trailing words here beyond the shared prefix okay"),
      (cleanId, "entirely different words with no overlap at all present here"),
      (trainId, s"leading context then $shared and more after that"))
      .toDF("doc_id", "text")
    val out = graft.text.Dedup.crossSplitContamination(df, n = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(evalId)._2, "planted 8-gram must be flagged")
    assert(out(evalId)._1 >= 1L)
    assert(!out(cleanId)._2, "clean doc must not be flagged")
    assert(!out.contains(trainId), "train docs are not scored")
  }

  test("chunkPlan covers every token exactly once at stride == chunk") {
    val df = Seq((1L, (1 to 250).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val rows = graft.text.TextFeatures.chunkPlan(df, chunk = 100, stride = 100)
      .orderBy("chunk_idx").collect()
      .map(r => (r.getInt(2), r.getInt(3), r.getInt(4)))
    assert(rows === Array((0, 0, 100), (1, 100, 100), (2, 200, 50)))
  }

  test("chunkPlan with overlap: last chunk short, starts stride apart") {
    val df = Seq((1L, (1 to 130).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val rows = graft.text.TextFeatures.chunkPlan(df, chunk = 128, stride = 96)
      .orderBy("chunk_idx").collect().map(r => (r.getInt(3), r.getInt(4)))
    assert(rows === Array((0, 128), (96, 34)))
  }

  test("packingPlan bins are contiguous within a source and respect capacity") {
    val docs = Seq(
      (1L, "s1", 3000), (2L, "s1", 2000), (3L, "s1", 4096), (4L, "s2", 100))
      .map { case (id, src, n) => (id, src, (1 to n).map(_ => "t").mkString(" ")) }
      .toDF("doc_id", "source", "text")
    val out = graft.text.TextFeatures.packingPlan(docs, capacity = 4096)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out(1L) === ((3000L, 3000L, 0L, 0L)))     // fits bin 0
    assert(out(2L) === ((2000L, 5000L, 0L, 1L)))     // straddles 0 -> 1
    assert(out(3L) === ((4096L, 9096L, 1L, 2L)))     // straddles 1 -> 2
    assert(out(4L) === ((100L, 100L, 0L, 0L)))       // s2 packs independently
  }

  test("lineitemShape matches two-pass central moments on the driver") {
    val xs = Seq.tabulate(500)(i => ("A", (i % 37).toDouble * 1.5 + (i % 11)))
    val df = xs.toDF("l_returnflag", "l_extendedprice")
    val r = Analytics.lineitemShape(df).collect().head
    val v = xs.map(_._2)
    val mu = v.sum / v.size
    val m2 = v.map(x => math.pow(x - mu, 2)).sum / v.size
    val m3 = v.map(x => math.pow(x - mu, 3)).sum / v.size
    val m4 = v.map(x => math.pow(x - mu, 4)).sum / v.size
    assert(r.getLong(1) === 500L)
    assert(math.abs(r.getDouble(2) - m3 / math.pow(m2, 1.5)) < 1e-5)
    assert(math.abs(r.getDouble(3) - (m4 / (m2 * m2) - 3.0)) < 1e-5)
  }

  test("approxQuantile honors its relative-error contract vs exact ranks") {
    val n = 10000
    val df = Seq.tabulate(n)(i => ((i * 7919) % n).toDouble).toDF("x")
    val eps = 0.01
    val qs = Array(0.25, 0.5, 0.9)
    val approx = df.stat.approxQuantile("x", qs, eps)
    // contract: returned value's RANK is within eps*n of the target rank
    val sorted = (0 until n).map(i => ((i * 7919) % n).toDouble).sorted
    qs.zip(approx).foreach { case (q, v) =>
      val rank = sorted.count(_ <= v)
      assert(math.abs(rank - q * n) <= eps * n + 1, s"quantile $q -> $v rank $rank")
    }
  }

  test("retentionCohorts counts distinct customers per cohort offset") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s + " 00:00:00")
    val orders = Seq(
      (1L, ts("2024-01-05")), (1L, ts("2024-02-10")), (1L, ts("2024-02-20")),
      (2L, ts("2024-01-15")), (3L, ts("2024-02-01")))
      .toDF("o_custkey", "o_orderdate")
    val out = graft.ops.Warehouse.retentionCohorts(orders).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val jan = 2024 * 12 + 1; val feb = jan + 1
    assert(out === Map((jan, 0) -> 2L, (jan, 1) -> 1L, (feb, 0) -> 1L))
  }

  test("abcClassification orders by revenue and cuts at 80/95 shares") {
    // revenues 50, 30, 15, 5 -> cum shares .5, .8, .95, 1.0 -> A A B C
    val li = Seq((1L, 50.0), (2L, 30.0), (3L, 15.0), (4L, 5.0))
      .map { case (k, v) => (k, v, 0.0) }
      .toDF("l_partkey", "l_extendedprice", "l_discount")
    val out = graft.ops.Warehouse.abcClassification(li).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getString(3)))).toMap
    assert(out(1L) === ((50.0, "A")))
    assert(out(2L) === ((30.0, "A")))   // cum .8 <= .80 inclusive
    assert(out(3L) === ((15.0, "B")))
    assert(out(4L) === ((5.0, "C")))
  }

  test("rfmScores quartiles are deterministic and span 1..4") {
    val ts = (d: Int) => java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")
    val orders = (1 to 16).map(i =>
      (i.toLong, ts(i % 28 + 1), 100.0 * i)).toDF("o_custkey", "o_orderdate", "o_totalprice")
    val a = graft.ops.Warehouse.rfmScores(orders).collect()
      .map(r => r.getLong(0) -> r.getInt(6)).toMap
    val b = graft.ops.Warehouse.rfmScores(orders.repartition(7)).collect()
      .map(r => r.getLong(0) -> r.getInt(6)).toMap
    assert(a === b, "scores must not depend on partitioning")
    // 16 customers, one order each -> 4 per quartile on monetary
    val mScores = graft.ops.Warehouse.rfmScores(orders).collect()
      .map(r => r.getInt(5))
    assert(mScores.groupBy(identity).view.mapValues(_.size).toMap ===
      Map(1 -> 4, 2 -> 4, 3 -> 4, 4 -> 4))
  }

  test("timeWeightedValue weights readings by their holding time") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(sec: Int) = new java.sql.Timestamp(t0.getTime + sec * 1000L)
    val ev = Seq(
      (1L, 1L, t(0), 10.0),   // held 10s
      (2L, 1L, t(10), 20.0),  // held 30s
      (3L, 1L, t(40), 99.0))  // last reading: no interval
      .toDF("event_id", "user_id", "ts", "value")
    val out = graft.stream.Events.timeWeightedValue(ev).collect()
    assert(out.length === 1)
    // (10*10 + 20*30) / 40 = 17.5
    assert(out.head.getDouble(1) === 17.5)
    assert(out.head.getLong(2) === 2L)
  }

  test("customerRevenueGini is 0 on equal revenues and ~(n-1)/n on one-holder") {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val equal = (1 to 8).map(i => (i.toLong, ts, 100.0))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val g0 = graft.ops.Warehouse.customerRevenueGini(equal).head.getDouble(1)
    assert(g0 === 0.0)
    val skewed = ((1 to 7).map(i => (i.toLong, ts, 0.01)) :+ (8L, ts, 10000.0))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val g1 = graft.ops.Warehouse.customerRevenueGini(skewed).head.getDouble(1)
    assert(g1 > 0.87 && g1 < 0.875, s"expected ~7/8 got $g1")
  }

  test("orderPriceMad is outlier-resistant where stddev is not") {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = ((1 to 99).map(i => ("O", ts, 100.0 + (i % 3))) :+
      ("O", ts, 1e6)).zipWithIndex
      .map { case ((s, t, p), i) => (i.toLong, s, t, p) }
      .toDF("o_orderkey", "o_orderstatus", "o_orderdate", "o_totalprice")
    val mad = graft.ops.Analytics.orderPriceMad(rows).head.getDouble(2)
    assert(mad <= 2.0, s"MAD blew up on one outlier: $mad")
  }

  test("sourceEntropy: uniform mixture = ln(k), single source = 0") {
    val uniform = (1 to 100).map(i => (i.toLong, s"src${i % 4}"))
      .toDF("doc_id", "source")
    val e = graft.text.TextStats.sourceEntropy(uniform).head
    assert(e.getLong(0) === 4L)
    assert(math.abs(e.getDouble(1) - math.log(4.0)) < 1e-6)
    val single = (1 to 10).map(i => (i.toLong, "only")).toDF("doc_id", "source")
    assert(graft.text.TextStats.sourceEntropy(single).head.getDouble(1) === 0.0)
  }

  test("monthlyYoY joins the shifted month and survives calendar gaps") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    // 2023-01 and 2024-01 present; 2023-06 has no 2024 partner
    val orders = Seq(
      (1L, ts("2023-01-10"), 100.0), (2L, ts("2023-06-01"), 50.0),
      (3L, ts("2024-01-20"), 150.0))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .withColumn("o_custkey", col("o_orderkey"))
    val out = graft.ops.Warehouse.monthlyYoY(orders).collect()
      .map(r => r.getDate(0).toString -> Option(r.get(2))).toMap
    assert(out("2023-01-01") === None)          // no prior year
    assert(out("2024-01-01") === Some(0.5))     // 100 -> 150
    assert(out("2023-06-01") === None)
  }

  test("chi2Independence: zero under exact independence, large under dependence") {
    // perfectly independent 2x2: every cell = 25
    val indep = (for { a <- Seq("x", "y"); b <- Seq("u", "v"); _ <- 1 to 25 }
      yield (a, b)).toDF("a", "b")
    val c0 = Analytics.chi2Independence(indep, "a", "b").head
    assert(c0.getLong(0) === 4L)
    assert(c0.getDouble(1) === 0.0)
    // perfect dependence: a determines b
    val dep = (for { a <- Seq("x", "y"); _ <- 1 to 50 }
      yield (a, if (a == "x") "u" else "v")).toDF("a", "b")
    val c1 = Analytics.chi2Independence(dep, "a", "b").head.getDouble(1)
    assert(c1 === 100.0, s"chi2 of perfect dependence should equal n: $c1")
  }

  test("chi2Independence treats NULL as a real category, not dropped rows") {
    // perfect dependence where one of the determined values is NULL: a=x->u,
    // a=y->NULL. With nulls folded into a sentinel category this is the same
    // 2x2 perfect-dependence table as above (chi2 = n = 100, 4 cells);
    // equality-join null semantics would drop the null rows from the
    // marginals and report a wrong statistic
    val dep = (for { a <- Seq("x", "y"); _ <- 1 to 50 }
      yield (a, if (a == "x") "u" else null)).toDF("a", "b")
    val c = Analytics.chi2Independence(dep, "a", "b").head
    assert(c.getLong(0) === 4L)
    assert(c.getDouble(1) === 100.0)
  }

  test("charEntropy: uniform alphabet = ln(k); repeated char = 0; ranks garbage") {
    val docs = Seq(
      (1L, "abcd"),              // 4 distinct chars, uniform -> ln 4
      (2L, "aaaa"),              // zero entropy
      (3L, "qx8k zj2v m9wp ln4t rb7g yc3h df6s"),   // base64-ish garbage
      (4L, "the cat sat on the mat and the cat sat"))
      .toDF("doc_id", "text")
    val out = graft.text.TextStats.charEntropy(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(math.abs(out(1L) - math.log(4.0)) < 1e-6)
    assert(out(2L) === 0.0)
    assert(out(3L) > out(4L), "garbage must out-score natural text")
  }

  test("sourceQualityProfile aggregates pass rate and mean tokens per source") {
    val good = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, "web", good), (2L, "web", "too short"),
      (3L, "books", good)).toDF("doc_id", "source", "text")
    val out = graft.text.TextStats.sourceQualityProfile(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out("web") === ((2L, 0.5)))
    assert(out("books") === ((1L, 1.0)))
  }

  test("peakConcurrency counts overlapping sessions by sweep line") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    // three users: u1 [0,10], u2 [5,15], u3 [20,25] -> peak 2
    val ev = Seq(
      (1L, 1L, t(0), 1.0), (2L, 1L, t(10), 1.0),
      (3L, 2L, t(5), 1.0), (4L, 2L, t(15), 1.0),
      (5L, 3L, t(20), 1.0), (6L, 3L, t(25), 1.0))
      .toDF("event_id", "user_id", "ts", "value")
    val r = graft.stream.Events.peakConcurrency(ev).head
    assert(r.getLong(0) === 2L)
    assert(r.getLong(1) === 3L)
  }

  test("unionByName aligns drifted schemas by name with null fill") {
    val legacy = Seq((1L, 10.0)).toDF("k", "price")
    val current = Seq((2L, "HIGH")).toDF("k", "prio")
    val u = legacy.unionByName(current, allowMissingColumns = true)
    assert(u.columns.toSeq === Seq("k", "price", "prio"))
    val rows = u.collect().map(r =>
      (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
    assert(rows === Set((1L, Some(10.0), None), (2L, None, Some("HIGH"))))
  }
}
