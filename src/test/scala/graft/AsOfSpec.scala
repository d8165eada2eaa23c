package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.AsOf

case class Quote(sym: String, ts: Timestamp, px: Double)
case class Trade(sym: String, ts: Timestamp, qty: Long)

class AsOfSpec extends SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s"2024-01-01 $s")

  test("asofJoin picks the latest right row at-or-before each left time") {
    val trades = df(Seq(
      Trade("A", t("10:00:05"), 100),
      Trade("A", t("10:00:10"), 200),  // exactly at quote time -> tie visible
      Trade("A", t("09:59:00"), 300),  // before any quote -> null
      Trade("B", t("10:00:07"), 400)))
    val quotes = df(Seq(
      Quote("A", t("10:00:00"), 1.0),
      Quote("A", t("10:00:10"), 2.0),
      Quote("B", t("10:00:06"), 9.0)))
    val joined = AsOf.asofJoin(trades, quotes, "sym", "ts", Seq("px"))
    val got = joined.collect()
      .map(r => (r.getAs[Long]("qty"), Option(r.getAs[Any]("asof_px")))).toMap
    assert(got(100L) === Some(1.0))
    assert(got(200L) === Some(2.0)) // <= semantics: tie uses the new quote
    assert(got(300L) === None)
    assert(got(400L) === Some(9.0))
    assert(joined.count() === 4)    // left-outer: every trade survives
  }

  test("rangeJoin finds exactly the |a-b| <= width pairs via bucket join") {
    val a = df(Seq(Quote("x", t("00:00:00"), 10.0), Quote("y", t("00:00:00"), 55.0)))
      .select(col("sym").as("la"), col("px").as("va"))
    val b = df(Seq(Quote("p", t("00:00:00"), 12.0), Quote("q", t("00:00:00"), 30.0),
        Quote("r", t("00:00:00"), 57.9)))
      .select(col("sym").as("lb"), col("px").as("vb"))
    val pairs = AsOf.rangeJoin(a, b, col("va"), col("vb"), width = 3.0)
      .select("la", "lb").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs === Set(("x", "p"), ("y", "r")))
  }
}
