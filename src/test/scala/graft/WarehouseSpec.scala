package graft

import org.apache.spark.sql.functions._

import graft.ops.{Analytics, Warehouse}
import graft.tables.Tables

/** Warehouse + analytics operators against the real sf0.001 testdata. */
class WarehouseSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private lazy val fact = Warehouse.factSales(
    Tables.lineitem(spark, d), Tables.orders(spark, d), Tables.customer(spark, d),
    Tables.part(spark, d), Tables.supplier(spark, d), Tables.nation(spark, d),
    Tables.region(spark, d))

  test("factSales keeps lineitem grain (RI holds in testdata)") {
    assert(fact.count() === Tables.lineitem(spark, d).count())
  }

  test("revenue aggregates are consistent across groupings") {
    val bySegment = Warehouse.revenueBySegmentMonth(fact)
      .agg(sum("total_revenue")).collect()(0).getDouble(0)
    val total = fact.agg(sum("revenue")).collect()(0).getDouble(0)
    assert(math.abs(bySegment - total) < 1.0) // only per-group rounding differs
  }

  test("topCustomersByRevenue returns k rows in strictly ordered revenue") {
    val top = Warehouse.topCustomersByRevenue(fact, 5).collect()
    assert(top.length === 5)
    val revs = top.map(_.getAs[Double]("total_revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("revenueRollup includes subtotals and a grand total") {
    val roll = Warehouse.revenueRollup(fact).collect()
    val grand = roll.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length === 1)
    assert(grand(0).getAs[Long]("n_rows") === fact.count())
  }

  test("window sequence numbers are dense per customer") {
    val seq = Analytics.customerOrderSequence(Tables.orders(spark, d))
    val perCust = seq.groupBy("o_custkey")
      .agg(max("rn").as("mx"), count(lit(1)).as("n"))
      .filter(col("mx") =!= col("n"))
    assert(perCust.count() === 0)
  }

  test("explain: fact join broadcasts dims and pushes filters to parquet") {
    val plan = fact.filter(col("c_mktsegment") === "BUILDING")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "dims should broadcast")
    val scans = fact.filter(col("p_type") === "STANDARD")
      .queryExecution.executedPlan.toString
    assert(scans.contains("PushedFilters: [IsNotNull(p_type), EqualTo(p_type,STANDARD)]")
      || scans.contains("EqualTo(p_type,STANDARD)"), "filter should push to scan")
  }
}
