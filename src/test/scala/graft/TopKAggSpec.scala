package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TopKAgg
import graft.tables.Tables

class TopKAggSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("typed top-k aggregator equals the window-sort spelling") {
    val orders = Tables.orders(spark, d)
    val agged = orders.groupBy("o_orderstatus")
      .agg(TopKAgg.topK(5)(col("o_totalprice"), col("o_orderkey")).as("top"))
      .select(col("o_orderstatus"), explode(col("top")).as("t"))
      .select(col("o_orderstatus"), col("t._1").as("o_totalprice"), col("t._2").as("o_orderkey"))
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    val windowed = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select("o_orderstatus", "o_totalprice", "o_orderkey")
    val a = agged.collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val b = windowed.collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(a === b)
    assert(a.size === 15) // 3 statuses x 5
  }

  test("aggregator output is best-first within each group") {
    val orders = Tables.orders(spark, d)
    val rows = orders.groupBy("o_orderstatus")
      .agg(TopKAgg.topK(3)(col("o_totalprice"), col("o_orderkey")).as("top"))
      .select("top").collect()
    rows.foreach { r =>
      val vals = r.getSeq[org.apache.spark.sql.Row](0).map(_.getDouble(0))
      assert(vals === vals.sortBy(-_))
    }
  }
}
