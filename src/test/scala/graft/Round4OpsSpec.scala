package graft

import org.apache.spark.sql.functions._

import graft.ops.Analytics
import graft.quality.Quality
import graft.text.TextStats

/** Round-4 operators: RANGE-frame moving averages, map-typed HOF analytics,
  * LATERAL joins, Benford screening, sentence stats, masking, CMS gate. */
class Round4OpsSpec extends SparkSpec {

  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  test("movingDailyRevenue: RANGE frame shrinks over calendar gaps") {
    // days 1,2,3 then a jump to day 10: the day-10 window must contain ONLY
    // day 10 (RANGE semantics) — a ROWS frame would wrongly reach back
    val orders = Seq(
      (1L, d("2026-01-01"), 10.0), (2L, d("2026-01-02"), 20.0),
      (3L, d("2026-01-03"), 30.0), (4L, d("2026-01-10"), 40.0))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val out = Analytics.movingDailyRevenue(orders).collect()
      .map(r => r.getDate(0).toString -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out("2026-01-03") === ((3L, 20.0)))   // (10+20+30)/3
    assert(out("2026-01-10") === ((1L, 40.0)))   // gap: window is just itself
  }

  test("priorityStatusMapShare keeps only >=5% cells and shares sum per group") {
    // priority A: 19 F + 1 P -> P is exactly 5% (kept, v*20 == total);
    // priority B: 97 F + 3 P -> P is 3% (dropped)
    val rows = Seq.fill(19)(("A", "F")) ++ Seq(("A", "P")) ++
      Seq.fill(97)(("B", "F")) ++ Seq.fill(3)(("B", "P"))
    val out = Analytics.priorityStatusMapShare(
      rows.toDF("o_orderpriority", "o_orderstatus"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out(("A", "F")) === ((19L, 20L, 0.95)))
    assert(out(("A", "P")) === ((1L, 20L, 0.05)))
    assert(out(("B", "F")) === ((97L, 100L, 0.97)))
    assert(!out.contains(("B", "P")))
  }

  test("benfordProfile extracts the first significant digit from exact cents") {
    // 0.09 -> cents 9 -> digit 9; 999.995 rounds to cents 100000 -> digit 1;
    // 25000.00 -> digit 2; zero/negative rows are excluded
    val orders = Seq(0.09, 999.995, 25000.00, 0.0, -5.0)
      .toDF("o_totalprice")
    val out = Quality.benfordProfile(orders, "o_totalprice").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out === Map(9 -> 1L, 1 -> 1L, 2 -> 1L))
    val shares = Quality.benfordProfile(orders, "o_totalprice").collect()
      .map(_.getDouble(2)).sum
    // shares are rounded to 6 dp individually, so the sum is 1 +- n*5e-7
    assert(math.abs(shares - 1.0) < 1e-5)
  }

  test("sentenceStats: splits on terminal runs, drops empties, null avg on none") {
    val docs = Seq(
      (1L, "One. Two!! Three?"),       // 3 sentences: 3,3,5 chars -> avg 3.6667
      (2L, "no terminal punctuation"), // 1 sentence (whole text)
      (3L, "..."))                     // nothing but terminals -> 0 sentences
      .toDF("doc_id", "text")
    val out = TextStats.sentenceStats(docs).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), Option(r.get(2))))).toMap
    assert(out(1L)._1 === 3)
    assert(out(1L)._2 === Some(3.6667))
    assert(out(2L) === ((1, Some(23.0))))
    assert(out(3L) === ((0, None)))
  }

  test("maskCustomerPii: stable hash, initial+mask, bucketed balance") {
    val customer = Seq(
      (1L, "Alice", 1234.56), (2L, "Bob", -42.0))
      .toDF("c_custkey", "c_name", "c_acctbal")
    val out = Quality.maskCustomerPii(customer).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getLong(3)))).toMap
    // sha2 is deterministic: hashing twice gives the same pseudonym key
    val again = Quality.maskCustomerPii(customer).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L)._1 === again(1L))
    assert(out(1L)._2 === "A***")
    assert(out(1L)._3 === 1L)     // floor(1234.56/1000)
    assert(out(2L)._3 === -1L)    // floor(-0.042) = -1, not truncation to 0
  }

  test("cmsGate: estimates never undercount and stay within eps bound") {
    val orders = (1L to 200L).flatMap(k => Seq.fill((k % 5 + 1).toInt)(k))
      .toDF("o_custkey")
    val r = Analytics.cmsGate(spark, orders, nProbes = 10).head
    assert(r.getLong(0) === 10L)
    assert(r.getLong(1) === 0L)
    assert(r.getBoolean(2))
  }

  test("temperatureMixture: alpha=1 proportional, alpha=0 uniform, weights sum to 1") {
    import graft.text.TextFeatures
    val docs = (Seq.fill(80)("big") ++ Seq.fill(20)("small")).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "source")
    val prop = TextFeatures.temperatureMixture(docs, alpha = 1.0).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(prop("big") === 0.8 && prop("small") === 0.2)
    val unif = TextFeatures.temperatureMixture(docs, alpha = 0.0).collect()
      .map(r => r.getString(0) -> ((r.getDouble(2), r.getLong(3)))).toMap
    assert(unif("big") === ((0.5, 50L)) && unif("small") === ((0.5, 50L)))
    // flattening: 0 < alpha < 1 moves weight from the big source to the small
    val t = TextFeatures.temperatureMixture(docs, alpha = 0.7).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(t("big") < 0.8 && t("small") > 0.2)
    assert(math.abs(t.values.sum - 1.0) < 1e-5)
  }

  test("interleavePlan: unique positions, consecutive positions cycle sources") {
    import graft.text.TextFeatures
    val docs = (1L to 12L).map(i => (i, s"s${i % 3}")).toDF("doc_id", "source")
    val out = TextFeatures.interleavePlan(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
    assert(out.map(_._4).distinct.length === 12)       // positions unique
    // equal-sized sources -> positions are exactly 0..11, and each
    // consecutive triple covers all 3 sources (round-robin)
    val bySrc = out.sortBy(_._4).map(_._2)
    assert(out.map(_._4).sorted.toSeq === (0L to 11L))
    bySrc.grouped(3).foreach(g => assert(g.toSet.size === 3))
    // deterministic: same input -> same order
    val again = TextFeatures.interleavePlan(docs).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    assert(again.toMap === out.map(r => (r._1, r._4)).toMap)
  }

  test("zipfSlope: heavy-tailed text fits a negative slope, flat text near zero") {
    import graft.text.TextStats
    // zipf-ish corpus: term k appears ~60/k times
    val zipfText = (1 to 30).flatMap(k => Seq.fill(60 / k)(s"w$k")).mkString(" ")
    val flatText = (1 to 30).flatMap(k => Seq.fill(10)(s"w$k")).mkString(" ")
    val z = TextStats.zipfSlope(Seq((1L, zipfText)).toDF("doc_id", "text"), 30)
      .head
    assert(z.getLong(0) === 30L)
    assert(z.getDouble(1) < -0.8, s"zipf slope: ${z.getDouble(1)}")
    assert(z.getDouble(2) > 0.9, s"fit r2: ${z.getDouble(2)}")
    val f = TextStats.zipfSlope(Seq((1L, flatText)).toDF("doc_id", "text"), 30)
      .head
    assert(math.abs(f.getDouble(1)) < 1e-6, s"flat slope: ${f.getDouble(1)}")
  }

  test("lateral top-k equals the window-rank formulation") {
    val customer = Seq((1L, "A"), (2L, "A"), (3L, "B"))
      .toDF("c_custkey", "c_mktsegment")
    val orders = Seq(
      (10L, 1L, 100.0), (11L, 1L, 300.0), (12L, 2L, 200.0), (13L, 2L, 50.0),
      (14L, 3L, 75.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val got = Analytics.topOrdersPerSegmentLateral(spark, customer, orders)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    // A's top-3 by price desc: 300(11), 200(12), 100(10); B: 75(14)
    assert(got === Set(("A", 11L, 300.0), ("A", 12L, 200.0), ("A", 10L, 100.0),
      ("B", 14L, 75.0)))
    // decorrelated: no per-outer-row re-execution — the plan must not
    // contain a cartesian product or nested loop
    val plan = Analytics.topOrdersPerSegmentLateral(spark, customer, orders)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }
}
