package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.money
import graft.ops.{Analytics, Documents, Warehouse}
import graft.quality.Quality
import graft.tables.Tables

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, each with a DuckDB-equivalent `oracleSql` (column names and
  * result types aligned on both sides; see SURVEY §7 "hard parts").
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def fact(s: SparkSession, d: String): DataFrame =
    Warehouse.factSales(
      t(s, d, "lineitem"), t(s, d, "orders"), t(s, d, "customer"),
      t(s, d, "part"), t(s, d, "supplier"), t(s, d, "nation"), t(s, d, "region"))

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Warehouse.revenueBySegmentMonth(fact(spark, "/root/testdata/sf0.001"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- reference surface: aggregates (SURVEY §2.4) ---
    "q01_orders_per_customer" -> ((s, d) =>
      t(s, d, "orders").groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))),
    "q02_parts_per_type" -> ((s, d) =>
      t(s, d, "part").groupBy("p_type").agg(count(lit(1)).as("n_parts"))),
    "q03_null_profile_customer" -> ((s, d) =>
      Quality.nullProfile(t(s, d, "customer"))),
    "q04_segment_counts" -> ((s, d) =>
      t(s, d, "customer").groupBy("c_mktsegment").agg(count(lit(1)).as("n_customers"))
        .orderBy(desc("n_customers"), asc("c_mktsegment"))),
    // --- quality suite (SURVEY §2.11) ---
    "q05_fk_orphans" -> { (s, d) =>
      val li = t(s, d, "lineitem"); val o = t(s, d, "orders")
      val c = t(s, d, "customer"); val p = t(s, d, "part")
      val a = Quality.checkForeignKey(li, o, "l_orderkey", "o_orderkey")
        .agg(count(lit(1)).as("lineitem_order_orphans"))
      val b = Quality.checkForeignKey(li, p, "l_partkey", "p_partkey")
        .agg(count(lit(1)).as("lineitem_part_orphans"))
      val cc = Quality.checkForeignKey(o, c, "o_custkey", "c_custkey")
        .agg(count(lit(1)).as("order_customer_orphans"))
      a.crossJoin(b).crossJoin(cc)
    },
    "q06_key_uniqueness" -> { (s, d) =>
      def u(name: String, key: String) =
        t(s, d, name).agg(count(lit(1)).as(s"${name}_rows"),
          countDistinct(col(key)).as(s"${name}_distinct"))
      u("customer", "c_custkey").crossJoin(u("orders", "o_orderkey"))
        .crossJoin(u("part", "p_partkey"))
    },
    // --- filters / predicates (SURVEY §2.2) ---
    "q07_theta_filter" -> ((s, d) =>
      Quality.checkPredicate(t(s, d, "lineitem"), col("l_discount") <= col("l_tax"))
        .select("l_orderkey", "l_linenumber", "l_discount", "l_tax")),
    "q08_order_consistency" -> { (s, d) =>
      val gross = round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        * (lit(1.0) + col("l_tax"))), 2).as("gross")
      val li = t(s, d, "lineitem").groupBy("l_orderkey").agg(gross)
      t(s, d, "orders").join(li, col("o_orderkey") === col("l_orderkey"))
        .agg(count(lit(1)).as("n_orders"),
          sum(when(abs(col("o_totalprice") - col("gross")) > 0.01, 1L)
            .otherwise(0L)).as("n_mismatch"))
    },
    // --- document ops (SURVEY §2.4 A3 + §2.9 explode) ---
    "q09_doc_nest" -> ((s, d) =>
      Documents.nest(t(s, d, "orders"), t(s, d, "lineitem"))),
    "q10_doc_roundtrip" -> ((s, d) =>
      Documents.unnest(Documents.nest(t(s, d, "orders"), t(s, d, "lineitem")))),
    // --- warehouse layer (SURVEY §2.3 J4, §2.4 A9, §2.6 O3) ---
    "q11_fact_sales" -> ((s, d) => fact(s, d)),
    "q12_revenue_by_segment_month" -> ((s, d) =>
      Warehouse.revenueBySegmentMonth(fact(s, d))),
    "q13_top_customers" -> ((s, d) =>
      Warehouse.topCustomersByRevenue(fact(s, d), 10)),
    "q14_revenue_rollup" -> ((s, d) => Warehouse.revenueRollup(fact(s, d))),
    // --- windows / set ops / scalars (SURVEY §2.5, §2.7, §2.8) ---
    "q15_order_window_seq" -> ((s, d) =>
      Analytics.customerOrderSequence(t(s, d, "orders"))),
    "q16_customers_without_orders" -> ((s, d) =>
      Analytics.customersWithoutOrders(t(s, d, "customer"), t(s, d, "orders"))),
    "q17_scalar_functions" -> ((s, d) =>
      Analytics.orderScalarProjection(t(s, d, "orders"))))

  def oracleSql: Map[String, String] = Map(
    "q01_orders_per_customer" ->
      "SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey",
    "q02_parts_per_type" ->
      "SELECT p_type, count(*) AS n_parts FROM part GROUP BY p_type",
    "q03_null_profile_customer" -> ("SELECT " +
      Tables.schemas("customer").fieldNames.map(c =>
        s"CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS ${c}_nulls")
        .mkString(", ") + " FROM customer"),
    "q04_segment_counts" ->
      ("SELECT c_mktsegment, count(*) AS n_customers FROM customer " +
        "GROUP BY c_mktsegment ORDER BY n_customers DESC, c_mktsegment"),
    "q05_fk_orphans" -> ("SELECT " +
      "(SELECT count(*) FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS lineitem_order_orphans, " +
      "(SELECT count(*) FROM lineitem WHERE l_partkey NOT IN (SELECT p_partkey FROM part)) AS lineitem_part_orphans, " +
      "(SELECT count(*) FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)) AS order_customer_orphans"),
    "q06_key_uniqueness" -> ("SELECT " +
      "(SELECT count(*) FROM customer) AS customer_rows, " +
      "(SELECT count(DISTINCT c_custkey) FROM customer) AS customer_distinct, " +
      "(SELECT count(*) FROM orders) AS orders_rows, " +
      "(SELECT count(DISTINCT o_orderkey) FROM orders) AS orders_distinct, " +
      "(SELECT count(*) FROM part) AS part_rows, " +
      "(SELECT count(DISTINCT p_partkey) FROM part) AS part_distinct"),
    "q07_theta_filter" ->
      ("SELECT l_orderkey, l_linenumber, l_discount, l_tax FROM lineitem " +
        "WHERE NOT coalesce(l_discount <= l_tax, FALSE)"),
    "q08_order_consistency" ->
      ("SELECT CAST(count(*) AS BIGINT) AS n_orders, " +
        "CAST(sum(CASE WHEN abs(o_totalprice - gross) > 0.01 THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch " +
        "FROM orders JOIN (SELECT l_orderkey, round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS gross " +
        "FROM lineitem GROUP BY l_orderkey) li ON o_orderkey = l_orderkey"),
    "q09_doc_nest" ->
      ("SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority, " +
        "list(struct_pack(l_linenumber := l_linenumber, l_partkey := l_partkey, l_quantity := l_quantity, " +
        "l_extendedprice := l_extendedprice, l_discount := l_discount) " +
        "ORDER BY l_linenumber, l_partkey, l_quantity, l_extendedprice, l_discount) AS items " +
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey " +
        "GROUP BY o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"),
    "q10_doc_roundtrip" ->
      ("SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority, " +
        "l_linenumber, l_partkey, l_quantity, l_extendedprice, l_discount " +
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey"),
    "q11_fact_sales" ->
      ("SELECT o_orderkey, l_linenumber, o_orderdate, o_orderstatus, c_custkey, c_mktsegment, " +
        "n_name AS nation, r_name AS region, p_type, l_quantity, " +
        s"${money.r2Sql("l_extendedprice * (1.0 - l_discount)")} AS revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey JOIN part ON l_partkey = p_partkey " +
        "JOIN supplier ON l_suppkey = s_suppkey JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey"),
    "q12_revenue_by_segment_month" ->
      ("SELECT c_mktsegment, date_trunc('month', o_orderdate) AS order_month, " +
        s"${money.r2Sql("sum(revenue)")} AS total_revenue, count(DISTINCT o_orderkey) AS n_orders, " +
        s"${money.r2Sql("sum(l_quantity)")} AS sum_qty FROM (" +
        "SELECT c_mktsegment, o_orderdate, o_orderkey, l_quantity, " +
        s"${money.r2Sql("l_extendedprice * (1.0 - l_discount)")} AS revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey" +
        ") GROUP BY c_mktsegment, order_month"),
    "q13_top_customers" ->
      (s"SELECT c_custkey, ${money.r2Sql(s"sum(${money.r2Sql("l_extendedprice * (1.0 - l_discount)")})")} AS total_revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey " +
        "GROUP BY c_custkey ORDER BY total_revenue DESC, c_custkey LIMIT 10"),
    "q14_revenue_rollup" ->
      (s"SELECT c_mktsegment, o_orderstatus, ${money.r2Sql("sum(revenue)")} AS total_revenue, count(*) AS n_rows FROM (" +
        "SELECT c_mktsegment, o_orderstatus, " +
        s"${money.r2Sql("l_extendedprice * (1.0 - l_discount)")} AS revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey" +
        ") GROUP BY ROLLUP (c_mktsegment, o_orderstatus)"),
    "q15_order_window_seq" ->
      ("SELECT o_custkey, o_orderkey, o_orderdate, " +
        "CAST(row_number() OVER w AS INTEGER) AS rn, " +
        "lag(o_totalprice) OVER w AS prev_total, " +
        s"${money.r2Sql("sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")} AS running_total " +
        "FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)"),
    "q16_customers_without_orders" ->
      "SELECT c_custkey FROM customer EXCEPT SELECT o_custkey AS c_custkey FROM orders",
    "q17_scalar_functions" ->
      ("SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year, " +
        "CAST(month(o_orderdate) AS INTEGER) AS o_month, " +
        "CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2026-01-01') AS INTEGER) AS days_before_2026, " +
        "o_orderstatus || '-' || o_orderpriority AS status_priority, " +
        "CAST(floor(o_totalprice / 1000.0) AS BIGINT) AS price_bucket, " +
        "round(abs(o_totalprice - 1000.0), 2) AS abs_diff_1000 FROM orders"))
}
