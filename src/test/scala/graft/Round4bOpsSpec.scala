package graft

import org.apache.spark.sql.functions._

import graft.ops.{Analytics, Documents}
import graft.text.TextStats

/** Round-4b operators: bitmap exact-distinct rollups, XML interchange,
  * native listagg, bigram PMI collocations — plus plan-shape asserts for the
  * shuffle-free charEntropy rewrite and the anti-join customersWithoutOrders. */
class Round4bOpsSpec extends SparkSpec {

  import spark.implicits._

  test("bitmapDistinct equals count(DISTINCT) across bucket boundaries") {
    // keys straddle several 32768-bit bitmap buckets, with heavy duplication
    val rows = (1 to 2000).map { i =>
      val status = if (i % 2 == 0) "O" else "F"
      (status, (i % 700).toLong * 40003L) // dups + keys far beyond one bucket
    }
    val df = rows.toDF("o_orderstatus", "o_custkey")
    val got = Analytics.bitmapDistinct(df, "o_orderstatus", "o_custkey", "n")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = df.groupBy("o_orderstatus")
      .agg(countDistinct("o_custkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want)
    // the partial layer really is re-aggregatable: distinct over the UNION of
    // both groups == bitmap_count of the OR of their bucket bitmaps
    val merged = Analytics.bitmapDistinct(
      df.withColumn("o_orderstatus", lit("all")), "o_orderstatus", "o_custkey", "n")
      .head.getLong(1)
    assert(merged === df.select(countDistinct("o_custkey")).head.getLong(0))
  }

  test("xmlRoundtrip is the identity on (long, string, double) orders") {
    val orders = Seq(
      (1L, "O", 1234.56), (2L, "F", 0.01), (3L, "P", 99999.99))
      .toDF("o_orderkey", "o_orderstatus", "o_totalprice")
    val back = Documents.xmlRoundtrip(orders)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(back === Set((1L, "O", 1234.56), (2L, "F", 0.01), (3L, "P", 99999.99)))
  }

  test("nationListPerRegion: ordered, delimited, deterministic") {
    val nation = Seq(
      (0L, "CANADA"), (0L, "BRAZIL"), (0L, "ARGENTINA"), (1L, "FRANCE"))
      .toDF("n_regionkey", "n_name")
    val out = Analytics.nationListPerRegion(nation).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(0L) === (("ARGENTINA|BRAZIL|CANADA", 3L)))
    assert(out(1L) === (("FRANCE", 1L)))
  }

  test("bigramPmi ranks a fixed collocation above independent fillers") {
    // "new york" always adjacent; filler tokens shuffled independently
    val rnd = new scala.util.Random(7)
    val fillers = Array("alpha", "beta", "gamma", "delta")
    val docs = (1L to 40L).map { i =>
      val words = Seq.fill(10)(fillers(rnd.nextInt(4))) ++ Seq("new", "york")
      (i, rnd.shuffle(words.grouped(2).toList).flatten.mkString(" ") + " new york")
    }.toDF("doc_id", "text")
    val out = TextStats.bigramPmi(docs, minCount = 5, topN = 10).collect()
    val top = out.head
    assert((top.getString(0), top.getString(1)) === (("new", "york")),
      s"top pair was ${top.getString(0)} ${top.getString(1)}")
    // PMI of the collocation must be strictly positive (above independence)
    assert(top.getDouble(3) > 0.5)
  }

  test("charEntropy plans with ZERO exchanges (per-row HOF, no shuffle)") {
    val docs = Seq((1L, "abcab")).toDF("doc_id", "text")
    val plan = TextStats.charEntropy(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"charEntropy shuffled:\n$plan")
  }

  test("customersWithoutOrders anti-join: no distinct aggregates in the plan") {
    val customer = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("c_custkey", "c_name")
    val orders = Seq((10L, 1L), (11L, 1L), (12L, 3L)).toDF("o_orderkey", "o_custkey")
    val q = Analytics.customersWithoutOrders(customer, orders)
    assert(q.collect().map(_.getLong(0)).toSet === Set(2L))
    // EXCEPT would plan two HashAggregates; the anti-join form plans none
    assert(!q.queryExecution.executedPlan.toString.contains("HashAggregate"))
  }
}
