package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.money.{r2, sumMoney}

/** Star-schema warehouse layer — the reference's planned-but-empty warehouse
  * notebook made real (`fact_sales` path declared at
  * `/root/reference/notebooks/config/settings.ipynb:48`, revenue aggregation
  * intent in `notebooks/01_dataLake_ingestion.ipynb` cell 15).
  *
  * Scale notes (100 TB): lineitem and orders are the two big tables; their
  * equi-join shuffles on the order key (or is shuffle-free when both are
  * bucketed by it at write time — see [[graft.tables.LakeTable]]). All other
  * dimensions are small and explicitly `broadcast`, so the star join costs
  * exactly one shuffle regardless of fact size. Aggregations below run as
  * partial (map-side) + final hash aggregates; no driver-side collection
  * anywhere.
  */
object Warehouse {

  /** Per-line net revenue, rounded to cents like the reference does for
    * monetary values (`/root/reference/src/generate_data.py:301-309`). */
  def revenue: Column = r2(col("l_extendedprice") * (lit(1.0) - col("l_discount")))

  /** fact_sales at lineitem grain: one wide, pre-joined fact table. */
  def factSales(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
                part: DataFrame, supplier: DataFrame, nation: DataFrame,
                region: DataFrame): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(
        col("o_orderkey"), col("l_linenumber"), col("o_orderdate"),
        col("o_orderstatus"), col("c_custkey"), col("c_mktsegment"),
        col("n_name").as("nation"), col("r_name").as("region"),
        col("p_type"), col("l_quantity"), revenue.as("revenue"))

  /** Slim revenue fact: lineitem ⋈ orders ⋈ customer only — the join set the
    * revenue reports actually consume. Catalyst prunes unused COLUMNS from
    * [[factSales]] but cannot eliminate its unused JOINS (an inner FK join
    * may change cardinality as far as the optimizer knows), so reports that
    * never touch part/supplier/nation/region should start from this fact and
    * skip four joins and four scans outright. */
  def factSalesSlim(lineitem: DataFrame, orders: DataFrame,
                    customer: DataFrame): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .select(
        col("o_orderkey"), col("o_orderdate"), col("o_orderstatus"),
        col("c_custkey"), col("c_mktsegment"), col("l_quantity"),
        revenue.as("revenue"))

  /** Revenue aggregates by market segment and order month (reference A9:
    * "revenue aggregation in the Data Warehouse layer"). */
  def revenueBySegmentMonth(fact: DataFrame): DataFrame =
    fact
      .groupBy(col("c_mktsegment"), date_trunc("month", col("o_orderdate")).as("order_month"))
      .agg(
        sumMoney(col("revenue")).as("total_revenue"),
        countDistinct("o_orderkey").as("n_orders"),
        r2(sum("l_quantity")).as("sum_qty"))

  /** Top-k customers by revenue — Spark plans TakeOrderedAndProject, so only
    * k rows per partition ever move to the driver-side limit. Ties broken by
    * key for determinism. */
  def topCustomersByRevenue(fact: DataFrame, k: Int): DataFrame =
    fact.groupBy("c_custkey")
      .agg(sumMoney(col("revenue")).as("total_revenue"))
      .orderBy(desc("total_revenue"), asc("c_custkey"))
      .limit(k)

  /** Subtotal grid over (segment, status) via ROLLUP — the reporting-layer
    * shape the reference's empty NB 05 declared. */
  /** Customer-lifetime-value profile (the reference's named downstream goal,
    * NB 01 cell 14 "Customer Lifetime Value analysis"): revenue, order
    * count/recency bounds, and average order value per customer. */
  def customerLifetimeValue(fact: DataFrame): DataFrame =
    fact.groupBy("c_custkey")
      .agg(
        countDistinct("o_orderkey").as("n_orders"),
        sumMoney(col("revenue")).as("total_revenue"),
        min(to_date(col("o_orderdate"))).as("first_order"),
        max(to_date(col("o_orderdate"))).as("last_order"),
        // divide the exact cents total (bit-identical across engines), not
        // the raw sum: raw-sum drift flips the rounding at half-cent points
        r2(sumMoney(col("revenue")) / countDistinct("o_orderkey")).as("avg_order_value"))

  /** Full subtotal lattice over (segment, status) via CUBE (SQL path for the
    * same Spark 4.1.2 analyzer reason as [[revenueRollup]]). */
  def revenueCube(fact: DataFrame): DataFrame = {
    val view = "graft_fact_for_cube"
    fact.select("c_mktsegment", "o_orderstatus", "revenue").createOrReplaceTempView(view)
    fact.sparkSession.sql(
      s"""SELECT c_mktsegment, o_orderstatus,
         |  CAST(sum(CAST(floor(revenue * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS total_revenue,
         |  count(*) AS n_rows
         |FROM $view GROUP BY CUBE (c_mktsegment, o_orderstatus)""".stripMargin)
  }

  /** Revenue pivoted to one column per order status — the PIVOT relational
    * operator with an explicit value list (no extra pass to discover values;
    * at scale always pass the list). Cents-exact sums per cell. */
  def revenuePivotByStatus(fact: DataFrame): DataFrame =
    fact.groupBy("c_mktsegment")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(sumMoney(col("revenue")))
      .withColumnRenamed("F", "rev_f")
      .withColumnRenamed("O", "rev_o")
      .withColumnRenamed("P", "rev_p")

  /** Approximate sketches for 100 TB profiling (SURVEY A10): HLL++ distinct
    * counts and approximate percentiles — fixed-size sketch state per
    * partition, merged on the driver-free final agg. */
  def orderSketches(orders: DataFrame): DataFrame =
    orders.agg(
      // rsd 1%: the verified accuracy gate (q37) allows 5%, so the sketch
      // has 5-sigma headroom — HLL++ still keeps fixed-size state
      approx_count_distinct(col("o_custkey"), 0.01).as("approx_customers"),
      approx_count_distinct(col("o_orderkey"), 0.01).as("approx_orders"),
      percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)).as("p50_price"),
      percentile_approx(col("o_totalprice"), lit(0.99), lit(10000)).as("p99_price"))

  /** Retention cohort grid: customers grouped by first-order month, counted
    * in each subsequent month they ordered again. Month index = year*12+month
    * (portable integer arithmetic — no interval types cross engines). Two
    * shuffles on the customer key, both over dimension-sized data. */
  def retentionCohorts(orders: DataFrame): DataFrame = {
    val m = (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("m")
    val o = orders.select(col("o_custkey"), m)
    val first = o.groupBy("o_custkey").agg(min("m").as("cohort_m"))
    o.join(first, "o_custkey")
      .groupBy(col("cohort_m"), (col("m") - col("cohort_m")).as("months_since"))
      .agg(countDistinct(col("o_custkey")).as("n_active"))
  }

  /** RFM scoring: quartile ranks for recency / frequency / monetary per
    * customer. Ties broken by customer key so `ntile` is deterministic and
    * engine-portable; monetary is exact integer cents. The scored input is
    * ONE ROW PER CUSTOMER — but the customer dimension is itself billions of
    * rows at 100 TB, so each quartile comes from a two-level global rank
    * ([[Analytics.globalPrefixSums]] bucketed on the metric's own range)
    * plus `ntile` arithmetic ([[Analytics.ntileFromRank]]) — identical
    * bucket membership to three global ntile sorts, with every global
    * window bounded by bucket count. */
  def rfmScores(orders: DataFrame): DataFrame = {
    val per = orders.groupBy("o_custkey").agg(
      max(to_date(col("o_orderdate"))).as("last_order"),
      count(lit(1)).as("frequency"),
      sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long"))
        .as("monetary_cents"))
    // bucket exprs are monotone ASC along each DESC sort order (negated
    // key / negated range bucket), so the two-level rank preserves it
    def scoreOn(d: DataFrame, bucket: Column, order: Seq[Column],
                name: String): DataFrame =
      Analytics.globalPrefixSums(d, bucket, order, Seq("one" -> lit(1L)))
        .withColumn(name,
          Analytics.ntileFromRank(col("cum_one"), col("total_one"), 4))
        .drop("cum_one", "total_one")
    val r = scoreOn(per, -datediff(col("last_order"), lit("1970-01-01")),
      Seq(col("last_order").desc, col("o_custkey").asc), "r_score")
    val f = scoreOn(r, -col("frequency"),
      Seq(col("frequency").desc, col("o_custkey").asc), "f_score")
    val m = scoreOn(f, -floor(col("monetary_cents") / lit(1000000L)),
      Seq(col("monetary_cents").desc, col("o_custkey").asc), "m_score")
    m.select(col("o_custkey"), col("frequency"), col("monetary_cents"),
        col("r_score"), col("f_score"), col("m_score"))
      .withColumn("rfm",
        col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
  }

  /** ABC (Pareto) classification of parts by revenue: rank parts by exact
    * cents revenue, cumulative share against the grand total, class A/B/C at
    * 80%/95%. Shares divide two longs — one IEEE op, identical everywhere —
    * so class boundaries can't flip between engines. One aggregate shuffle,
    * then the cumulative revenue is a two-level running sum
    * ([[Analytics.globalPrefixSums]] bucketed on the cents range) — the part
    * dimension is data-sized at 100 TB, so no unpartitioned part-sized
    * sort; the grand total rides the same bucket table. */
  def abcClassification(lineitem: DataFrame): DataFrame = {
    val per = lineitem.groupBy("l_partkey")
      .agg(sum(floor(revenue * lit(100.0) + lit(0.5)).cast("long")).as("cents"))
    Analytics.globalPrefixSums(per, -floor(col("cents") / lit(1000000L)),
        Seq(col("cents").desc, col("l_partkey").asc),
        Seq("c" -> col("cents")))
      .select(col("l_partkey"),
        (col("cents").cast("double") / lit(100.0)).as("part_revenue"),
        (col("cum_c").cast("double") /
          col("total_c").cast("double")).as("cum_share"))
      .withColumn("abc_class",
        when(col("cum_share") <= 0.80, "A")
          .when(col("cum_share") <= 0.95, "B").otherwise("C"))
      .withColumn("cum_share", round(col("cum_share"), 6))
  }

  /** Gini coefficient of customer revenue concentration, by the rank
    * formula G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) over ascending
    * x. EVERYTHING stays in exact integer cents until one final double
    * division, so the coefficient is bit-identical across engines and
    * partitionings (rank ties on equal amounts cannot change the sum). The
    * rank is a two-level global row number ([[Analytics.globalPrefixSums]]
    * bucketed on the cents range) — one row per customer, but the customer
    * dimension at 100 TB is billions of rows, so no unpartitioned
    * customer-sized sort. */
  def customerRevenueGini(orders: DataFrame): DataFrame = {
    val per = orders.groupBy("o_custkey")
      .agg(sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long"))
        .as("cents"))
    val ranked = Analytics.globalPrefixSums(per,
        floor(col("cents") / lit(1000000L)),
        Seq(col("cents").asc, col("o_custkey").asc),
        Seq("one" -> lit(1L)))
      .select(col("cents"), col("cum_one").as("i"))
    ranked
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s0"),
        sum(col("i").cast("long") * col("cents")).as("s1"))
      .select(col("n"),
        // all-zero revenue (s0 = 0) has no defined concentration -> null,
        // rather than the engine-dependent 0/0 double
        round(when(col("s0") > 0L,
          (lit(2L) * col("s1") - (col("n") + lit(1L)) * col("s0"))
            .cast("double") / (col("n") * col("s0")).cast("double")), 6)
          .as("gini"))
  }

  /** The reference's declared REPORTING layer (notebook 05, an empty stub
    * there) composed end to end: fact build → per-segment revenue roll-up →
    * top-customer pick → share-of-parent — one summary row per market
    * segment: exact-cents revenue, distinct orders/customers, revenue share
    * of total, rank, and the segment's top customer (max revenue, ties to
    * the lower key via the negated-key struct max). Everything reduces to
    * segment grain after ONE fact aggregate, so the final rank/share
    * windows run over |segments| rows. Pair with
    * [[graft.tables.LakeTable.write]] + CHECK constraints to publish it as
    * a governed lake artifact (q161 does exactly that). */
  def reportingSummary(fact: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = floor(col("revenue") * lit(100.0) + lit(0.5)).cast("long")
    val perCust = fact.groupBy("c_mktsegment", "c_custkey")
      .agg(sum(cents).as("cust_cents"),
        countDistinct(col("o_orderkey")).as("cust_orders"))
    val leaf = perCust.groupBy("c_mktsegment").agg(
      sum("cust_cents").as("seg_cents"),
      sum("cust_orders").as("n_orders"),
      count(lit(1)).as("n_customers"),
      max(struct(col("cust_cents"), (-col("c_custkey")).as("neg_key")))
        .as("top"))
    val w = Window.orderBy(desc("seg_cents"), asc("c_mktsegment"))
    leaf.select(col("c_mktsegment"),
        (col("seg_cents").cast("double") / lit(100.0)).as("revenue"),
        col("n_orders"), col("n_customers"),
        round(col("seg_cents").cast("double") /
          sum(col("seg_cents")).over().cast("double"), 6).as("share_of_total"),
        rank().over(w).as("revenue_rank"),
        (-col("top.neg_key")).as("top_custkey"),
        (col("top.cust_cents").cast("double") / lit(100.0)).as("top_cust_revenue"))
  }

  /** Year-over-year monthly revenue growth via a self-join on the shifted
    * month key (robust to calendar gaps, unlike a `lag(12)` row offset).
    * Exact-cents monthly totals; growth is one long-to-double division. */
  def monthlyYoY(orders: DataFrame): DataFrame = {
    val monthly = orders
      .groupBy(trunc(to_date(col("o_orderdate")), "month").as("month_start"))
      .agg(sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long"))
        .as("cents"))
    val prev = monthly.select(
      add_months(col("month_start"), 12).as("month_start"),
      col("cents").as("prev_cents"))
    monthly.join(prev, Seq("month_start"), "left")
      .select(col("month_start"),
        (col("cents").cast("double") / lit(100.0)).as("revenue"),
        round((col("cents").cast("double") - col("prev_cents").cast("double")) /
          col("prev_cents").cast("double"), 6).as("yoy_growth"))
  }

  def revenueRollup(fact: DataFrame): DataFrame = {
    // SQL GROUP BY ROLLUP rather than Dataset.rollup: in Spark 4.1.2 the
    // Dataset grouping-analytics path trips the ambiguous-self-join detector
    // on any post-join column (even after projection); the SQL analyzer
    // resolves the identical plan cleanly.
    val view = "graft_fact_for_rollup"
    fact.select("c_mktsegment", "o_orderstatus", "revenue").createOrReplaceTempView(view)
    // Cents-sum (BIGINT) so the subtotal/grand-total rows — which aggregate
    // the whole fact — are order-independent and bit-identical across engines.
    fact.sparkSession.sql(
      s"""SELECT c_mktsegment, o_orderstatus,
         |  CAST(sum(CAST(floor(revenue * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS total_revenue,
         |  count(*) AS n_rows
         |FROM $view GROUP BY ROLLUP (c_mktsegment, o_orderstatus)""".stripMargin)
  }

  /** Share-of-parent down the region → nation hierarchy: each nation's
    * revenue as a fraction of its region, each region's as a fraction of
    * the total — the percent-of-parent column every drill-down report
    * carries. Leaf aggregation keeps EXACT integer cents; the parent and
    * grand totals are window sums over those longs (associative — no float
    * re-aggregation drift), with the two divisions rounded at the end.
    * Dimension tables broadcast; the only big shuffle is the leaf groupBy.
    */
  def revenueShareOfParent(orders: DataFrame, customer: DataFrame,
                           nation: DataFrame, region: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val leaf = orders
      .join(customer.select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region.select("r_regionkey", "r_name")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long"))
        .as("cents"))
    val byRegion = Window.partitionBy("r_name")
    val all = Window.partitionBy()
    leaf.select(col("r_name"), col("n_name"),
        (col("cents").cast("double") / lit(100.0)).as("revenue"),
        round(col("cents").cast("double") /
          sum("cents").over(byRegion).cast("double"), 6).as("share_of_region"),
        round(sum("cents").over(byRegion).cast("double") /
          sum("cents").over(all).cast("double"), 6).as("region_share_of_total"))
  }
}
