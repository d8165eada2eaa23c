package graft

import org.apache.spark.sql.functions._

import graft.ops.{Analytics, Graph}
import graft.stream.Events
import graft.text.{Dedup, TextFeatures, TextStats}

/** Round-4c operators: triangle census, per-key EWMA, KS drift test,
  * JS mixture divergence, activity streaks, lexical diversity, boilerplate
  * prefixes, syllable complexity. */
class Round4cOpsSpec extends SparkSpec {

  import spark.implicits._

  test("triangleCount counts each triangle once on a known graph") {
    // K4 on {1,2,3,4} (4 triangles) plus a pendant edge 4-5 (no new triangle)
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
      .toDF("part_a", "part_b")
    val r = Graph.triangleCount(edges).head
    assert(r.getLong(0) === 5L)   // vertices
    assert(r.getLong(1) === 7L)   // edges
    assert(r.getLong(2) === 4L)   // triangles
  }

  test("triangleCount is zero on a triangle-free graph") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("part_a", "part_b")
    assert(Graph.triangleCount(path).head.getLong(2) === 0L)
  }

  test("userValueEwma folds left with alpha weighting") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    val ev = Seq(
      (1L, ts(0), 7L, "c", 1.0), (2L, ts(1), 7L, "c", 2.0), (3L, ts(2), 7L, "c", 3.0),
      (4L, ts(0), 8L, "c", 10.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Events.userValueEwma(ev, alpha = 0.25)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // user 7: e0=1; e1=.25*2+.75*1=1.25; e2=.25*3+.75*1.25=1.6875
    assert(got(7L)._1 === 3L)
    assert(math.abs(got(7L)._2 - 1.6875) < 1e-12)
    assert(got(8L) === ((1L, 10.0))) // single event: ewma = x0
  }

  test("ksStatistic is 0 for identical samples and 1 for disjoint ones") {
    val same = (1 to 100).flatMap(i => Seq(("a", i.toDouble), ("b", i.toDouble)))
      .toDF("g", "v")
    val d0 = Analytics.ksStatistic(same, "v", col("g") === "a").head.getDouble(2)
    assert(d0 === 0.0)
    val disjoint = ((1 to 50).map(i => ("a", i.toDouble)) ++
      (51 to 100).map(i => ("b", i.toDouble))).toDF("g", "v")
    val d1 = Analytics.ksStatistic(disjoint, "v", col("g") === "a").head.getDouble(2)
    assert(d1 === 1.0)
  }

  test("ksStatistic detects a shifted distribution") {
    val df = ((1 to 100).map(i => ("a", i.toDouble)) ++
      (1 to 100).map(i => ("b", i.toDouble + 50.0))).toDF("g", "v")
    val d = Analytics.ksStatistic(df, "v", col("g") === "a").head.getDouble(2)
    assert(d === 0.5) // CDFs separate by exactly the 50/100 shift
  }

  test("sourceJsDivergence: identical mixes diverge 0, disjoint mixes ln 2") {
    val same = Seq(
      (1L, "en", "s1"), (2L, "fr", "s1"), (3L, "en", "s2"), (4L, "fr", "s2"))
      .toDF("doc_id", "lang", "source")
    val r0 = TextStats.sourceJsDivergence(same)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(r0.values.forall(_ === 0.0))
    // source s1 is all-en, the corpus is half en half fr: JS(p, q) where
    // p=(1,0), q=(.5,.5) -> 0.5*ln(4/3) + 0.5*(0.5*ln(... known value
    val skewed = Seq(
      (1L, "en", "s1"), (2L, "en", "s1"), (3L, "fr", "s2"), (4L, "fr", "s2"))
      .toDF("doc_id", "lang", "source")
    val r1 = TextStats.sourceJsDivergence(skewed)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // p=(1,0) vs q=(.5,.5): m=(.75,.25); js = .5*(1*ln(1/.75)) +
    //   .5*(.5*ln(.5/.75) + .5*ln(.5/.25))
    val expect = 0.5 * math.log(1 / 0.75) +
      0.5 * (0.5 * math.log(0.5 / 0.75) + 0.5 * math.log(0.5 / 0.25))
    assert(math.abs(r1("s1") - expect) < 1e-6)
    assert(math.abs(r1("s2") - expect) < 1e-6)
  }

  test("activityStreaks finds the longest consecutive-day run") {
    def day(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-${d}%02d 12:00:00")
    val ev = Seq(
      // user 7: days 1,2,3 then 5,6 -> longest 3, active 5
      (1L, day(1), 7L), (2L, day(2), 7L), (3L, day(3), 7L),
      (4L, day(5), 7L), (5L, day(6), 7L),
      (6L, day(2), 7L), // duplicate day must not break the streak
      // user 8: single day
      (7L, day(9), 8L))
      .toDF("event_id", "ts", "user_id")
    val got = Events.activityStreaks(ev)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(7L) === ((5L, 3L)))
    assert(got(8L) === ((1L, 1L)))
  }

  test("lexicalDiversity counts types and hapax correctly") {
    val docs = Seq(
      (1L, "the cat and the dog and the cat run"), // the:3 cat:2 and:2 dog:1 run:1
      (2L, "aa aa aa aa"))
      .toDF("doc_id", "text")
    val got = TextStats.lexicalDiversity(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got(1L) === ((9L, 5L, 2L, math.round(5.0 / 9.0 * 1e6) / 1e6)))
    assert(got(2L) === ((4L, 1L, 0L, 0.25)))
  }

  test("prefixDupStats groups docs sharing their opening tokens") {
    val stamp = (1 to 20).map(i => s"w$i").mkString(" ") // 20-token boilerplate
    val docs = Seq(
      (1L, s"$stamp unique tail one"),
      (2L, s"$stamp other ending"),
      (3L, s"$stamp third body"),
      (4L, "completely different text entirely"),
      (5L, "another singleton document"))
      .toDF("doc_id", "text")
    val r = Dedup.prefixDupStats(docs, prefixTokens = 16).head
    assert(r.getLong(0) === 1L) // one duplicated prefix group
    assert(r.getLong(1) === 3L) // covering docs 1..3
    assert(r.getLong(2) === 3L)
    // short docs: prefix = whole text, no crash
    val short = Seq((1L, "tiny"), (2L, "tiny"), (3L, "x")).toDF("doc_id", "text")
    assert(Dedup.prefixDupStats(short).head.getLong(1) === 2L)
  }

  test("reachableParts expands min-hop distances from the smallest part") {
    // path 1-2-3-4-5 plus a disconnected 10-11; seed = min(part_a) = 1
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("part_a", "part_b")
    val got = Analytics.reachableParts(spark, pairs, maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3))
  }

  test("dailyRevenueAutocorr is 1 for a perfect weekly cycle") {
    val t0 = java.time.LocalDate.parse("2024-01-01")
    val orders = (0 until 28).map { d =>
      (d.toLong, java.sql.Timestamp.valueOf(t0.plusDays(d).atStartOfDay),
        10.0 + (d % 7) * 3.0) // same value every 7 days
    }.toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val r = Analytics.dailyRevenueAutocorr(orders, lagDays = 7).head
    assert(r.getLong(0) === 21L)
    assert(r.getDouble(1) === 1.0)
  }

  test("cleanText strips controls, folds accents, collapses whitespace") {
    val dirty = Seq((1L, "  héllo\u0001world   café  "),
      (2L, "already clean")).toDF("doc_id", "text")
    val cleaned = dirty.select(col("doc_id"),
      TextStats.cleanText(col("text")).as("c")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cleaned(1L) === "hello world cafe")
    assert(cleaned(2L) === "already clean")
    val prof = TextStats.cleanupProfile(dirty).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(prof(1L)._1 === "hello world cafe".length)
    assert(prof(2L) === (("already clean".length, 0)))
  }

  test("robustOutliers flags only the planted extreme via the MAD rule") {
    val vals = (1 to 9).map(v => ("O", v.toDouble)) :+ (("O", 100.0))
    val orders = vals.toDF("o_orderstatus", "o_totalprice")
    val r = Analytics.robustOutliers(orders, k = 3.0).head
    // median 5.5, MAD 2.5 -> threshold 7.5: only 100.0 exceeds it
    assert(r.getLong(1) === 10L)
    assert(r.getLong(2) === 1L)
    assert(r.getDouble(3) === 0.1)
  }

  test("mannWhitneyU computes U with midrank tie handling") {
    val df1 = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0)).toDF("g", "v")
    val r1 = Analytics.mannWhitneyU(df1, "v", col("g") === "a").head
    assert((r1.getLong(0), r1.getLong(1)) === ((2L, 1L)))
    assert(r1.getDouble(2) === 0.0) // a entirely below b
    assert(r1.getDouble(3) === 2.0)
    val tied = Seq(("a", 5.0), ("b", 5.0)).toDF("g", "v")
    val r2 = Analytics.mannWhitneyU(tied, "v", col("g") === "a").head
    assert(r2.getDouble(2) === 0.5) // midrank 1.5 -> U splits the tie
    assert(r2.getDouble(3) === 0.5)
  }

  test("prioritySample is deterministic, size-n, and weight-biased") {
    val docs = ((1 to 200).map(i => (i.toLong, 1000L)) ++
      (201 to 400).map(i => (i.toLong, 1L))).toDF("doc_id", "n_chars")
    val s1 = TextFeatures.prioritySample(docs, 20).collect()
    val s2 = TextFeatures.prioritySample(docs, 20).collect()
    assert(s1.map(_.getLong(0)).toSeq === s2.map(_.getLong(0)).toSeq)
    assert(s1.length === 20)
    // heavy (1000x) rows dominate the fixed-hash draw
    assert(s1.count(_.getLong(1) === 1000L) >= 15)
    // priority really is w/u with u in (0,1]: never below the weight
    assert(s1.forall(r => r.getDouble(2) >= r.getLong(1).toDouble))
    // zero/negative weights are excluded entirely
    val withZero = docs.withColumn("n_chars",
      when(col("doc_id") <= 200, lit(0L)).otherwise(col("n_chars")))
    assert(TextFeatures.prioritySample(withZero, 300).collect()
      .forall(_.getLong(1) > 0L))
  }

  test("coPurchaseTriples counts distinct-item triples with support") {
    // basket 10: {1,2,3,4}; basket 20: {1,2,3}; basket 30: {1,1,2,3} (dup)
    val li = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L), (10L, 4L),
      (20L, 1L), (20L, 2L), (20L, 3L),
      (30L, 1L), (30L, 1L), (30L, 2L), (30L, 3L))
      .toDF("l_orderkey", "l_partkey")
    val all = graft.ops.Graph.coPurchaseTriples(li, minCount = 1)
      .collect().map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getLong(3))).toMap
    assert(all(((1L, 2L, 3L))) === 3L) // duplicate part must not double-count
    assert(all(((1L, 2L, 4L))) === 1L)
    assert(all.size === 4)
    val sup2 = graft.ops.Graph.coPurchaseTriples(li, minCount = 2).collect()
    assert(sup2.length === 1 && sup2.head.getLong(3) === 3L)
  }

  test("revenueShareOfParent: nation shares sum to 1 within each region") {
    val orders = Seq((1L, 1L, 100.0), (2L, 2L, 300.0), (3L, 3L, 600.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Seq((1L, 11), (2L, 12), (3L, 13)).toDF("c_custkey", "c_nationkey")
    val nation = Seq((11, "n1", 1), (12, "n2", 1), (13, "n3", 2))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val region = Seq((1, "r1"), (2, "r2")).toDF("r_regionkey", "r_name")
    val got = graft.ops.Warehouse
      .revenueShareOfParent(orders, customer, nation, region)
      .collect().map(r => r.getString(1) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got("n1") === ((100.0, 0.25, 0.4)))  // 100/400, region 400/1000
    assert(got("n2") === ((300.0, 0.75, 0.4)))
    assert(got("n3") === ((600.0, 1.0, 0.6)))
  }

  test("syllableComplexity approximates vowel-group syllables") {
    val docs = Seq((1L, "beautiful sky")).toDF("doc_id", "text")
    val r = TextStats.syllableComplexity(docs).head
    // beautiful -> eau,i,u = 3; sky -> y = 1
    assert(r.getLong(1) === 2L)  // n_words
    assert(r.getLong(2) === 4L)  // n_syllables
    assert(r.getDouble(3) === 2.0)
    assert(r.getDouble(4) === 0.5) // one of two words is 3+ syllables
  }
}
