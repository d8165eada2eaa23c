package graft

import org.apache.spark.sql.functions._

import graft.ops.{Graph, Warehouse}
import graft.tables.Tables

class GraphSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"
  private lazy val edges =
    Graph.purchaseEdges(Tables.lineitem(spark, d), Tables.orders(spark, d))

  test("purchase edges aggregate to the lineitem total") {
    assert(edges.agg(sum("n_purchases")).collect()(0).getLong(0) ===
      Tables.lineitem(spark, d).count())
  }

  test("co-purchase pairs are symmetric-free and bounded by order size") {
    val pairs = Graph.coPurchasePairs(Tables.lineitem(spark, d), minCount = 1)
    assert(pairs.filter(col("part_a") >= col("part_b")).count() === 0)
    // total pair occurrences == sum over orders of C(lines_with_distinct_parts, 2)
    val li = Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val expected = li.groupBy("l_orderkey").count()
      .agg(sum((col("count") * (col("count") - 1) / 2).cast("long")))
      .collect()(0).getLong(0)
    // lineitem can repeat a part within an order; distinct-part pairs differ,
    // so compare against the raw (non-distinct) combination count instead
    val rawExpected = Tables.lineitem(spark, d).groupBy("l_orderkey").count()
      .agg(sum((col("count") * (col("count") - 1) / 2).cast("long")))
      .collect()(0).getLong(0)
    val got = pairs.agg(sum("n_together")).collect()(0).getLong(0)
    assert(got <= rawExpected && got >= expected / 2, s"got $got raw=$rawExpected distinct=$expected")
  }

  test("degree-oriented triangle census equals the id-ordered reference") {
    import spark.implicits._
    // real co-purchase edges (the q144 input)
    val co = Graph.coPurchasePairs(Tables.lineitem(spark, d)).drop("n_together")
    assert(Graph.triangleCount(co).head === Graph.triangleCountIdOrdered(co).head)
    // hub graph — the shape the orientation exists for: a degree-20 center
    // must contribute its triangles without pivoting its full neighborhood
    val hub = ((1L to 20L).map(i => (i, 100L)) ++ Seq((1L, 2L), (2L, 3L)))
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .toDF("part_a", "part_b")
    val r = Graph.triangleCount(hub).head
    assert(Graph.triangleCountIdOrdered(hub).head === r)
    assert(r.getLong(2) === 2L) // (1,2,100) and (2,3,100)
    graft.ops.Caching.releaseAll(spark)
  }

  test("Apriori-pruned triples equal the naive all-baskets expansion") {
    val li = Tables.lineitem(spark, d)
    val b = li.select(col("l_orderkey"), col("l_partkey")).distinct()
    val naive = b.as("x")
      .join(b.as("y"), col("x.l_orderkey") === col("y.l_orderkey") &&
        col("x.l_partkey") < col("y.l_partkey"))
      .join(b.as("z"), col("y.l_orderkey") === col("z.l_orderkey") &&
        col("y.l_partkey") < col("z.l_partkey"))
      .groupBy(col("x.l_partkey").as("part_a"), col("y.l_partkey").as("part_b"),
        col("z.l_partkey").as("part_c"))
      .agg(count(lit(1)).as("n_together"))
      .filter(col("n_together") >= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val pruned = Graph.coPurchaseTriples(li, minCount = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(pruned === naive, "prune must not change surviving triples or counts")
  }

  test("GraphX interop: graph materializes with disjoint vertex spaces") {
    val g = Graph.toGraphX(edges)
    assert(g.numEdges === edges.count())
    val customers = Tables.orders(spark, d).select("o_custkey").distinct().count()
    val parts = edges.select("dst_partkey").distinct().count()
    assert(g.numVertices === customers + parts)
    // a quick iterative algorithm runs: connected components converges
    val cc = g.connectedComponents(maxIterations = 5)
    assert(cc.vertices.count() === g.numVertices)
  }

  test("approx sketches land within tolerance of exact counts") {
    val orders = Tables.orders(spark, d)
    val r = Warehouse.orderSketches(orders).collect()(0)
    val exactCust = orders.select("o_custkey").distinct().count()
    val exactOrd = orders.count()
    assert(math.abs(r.getAs[Long]("approx_customers") - exactCust).toDouble / exactCust < 0.1)
    assert(math.abs(r.getAs[Long]("approx_orders") - exactOrd).toDouble / exactOrd < 0.1)
    val p50 = r.getAs[Double]("p50_price")
    val sorted = orders.select("o_totalprice").orderBy("o_totalprice")
      .collect().map(_.getDouble(0))
    val trueMedian = sorted(sorted.length / 2)
    assert(math.abs(p50 - trueMedian) / trueMedian < 0.05)
  }
}
