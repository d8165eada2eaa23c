package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ops.{Analytics, Warehouse}
import graft.sim.Similarity
import graft.stream.Events

case class Ord2(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
                o_totalprice: Double, o_orderdate: Timestamp)
case class Cust2(c_custkey: Long, c_mktsegment: String)
case class Emb2(vec_id: Long, embedding: Seq[Float], label: Int)
case class Part2(p_partkey: Long, p_name: String, p_brand: String, p_type: String)
case class Li2(l_orderkey: Long, l_linenumber: Int, l_partkey: Long,
               l_quantity: Double, l_extendedprice: Double, l_discount: Double,
               l_tax: Double, l_shipdate: Timestamp)

class Round2OpsSpec extends SparkSpec {

  private def t(min: Int) = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
  private def day(d: String) = Timestamp.valueOf(s"$d 00:00:00")

  private val events = Seq(
    Ev(1, t(0), 1, "view", 1.0, """{"k": 1}"""),
    Ev(2, t(30), 1, "view", 2.0, """{"k": 2}"""),
    Ev(3, t(45), 1, "purchase", 10.0, """{"k": 3}"""),
    Ev(4, t(50), 2, "purchase", 20.0, """{"k": 4}"""),  // no prior views
    Ev(5, t(55), 1, "view", 3.0, """{"k": 5}"""))       // after the purchase

  test("viewsBeforePurchase counts only same-user views inside the window") {
    val r = Events.viewsBeforePurchase(df(events), windowMinutes = 40)
      .collect().map(x => x.getAs[Long]("event_id") ->
        (x.getAs[Long]("n_views"), Option(x.getAs[Timestamp]("last_view_ts")))).toMap
    // purchase@45: view@30 inside 40min window; view@0 outside; view@55 after
    assert(r(3L) === ((1L, Some(t(30)))))
    assert(r(4L) === ((0L, None)))
  }

  test("streaming stream-stream interval join matches the batch join stage") {
    val q = Events.streamingPurchaseAttribution(spark, eventsDir("r2ss"), 60)
      .writeStream.format("memory").queryName("r2_attr")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("r2_attr")
      .select("event_id", "view_event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch twin on the same file
    val ev = graft.tables.Tables.events(spark, "/root/testdata/sf0.001")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("pts"), col("event_id"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user_id"), col("ts").as("vts"),
        col("event_id").as("view_event_id"))
    val batch = p.join(v, col("user_id") === col("v_user_id") &&
        col("vts") <= col("pts") &&
        col("vts") >= col("pts") - expr("INTERVAL 60 MINUTES"))
      .select("event_id", "view_event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }

  /** Stage the sf0.001 events parquet alone in a temp dir (streaming file
    * sources glob whole directories). */
  private def eventsDir(tag: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-$tag")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  test("latestEventPerUser keeps exactly the last event by (ts, id)") {
    val r = Events.latestEventPerUser(df(events)).collect()
      .map(x => x.getAs[Long]("user_id") -> x.getAs[Long]("event_id")).toMap
    assert(r === Map(1L -> 5L, 2L -> 4L))
  }

  test("propsProjection extracts k as typed int and as string") {
    val r = Events.propsProjection(df(events)).orderBy("event_id").collect()
    assert(r.map(_.getAs[Int]("k_typed")).toSeq === Seq(1, 2, 3, 4, 5))
    assert(r.map(_.getAs[String]("k_str")).toSeq === Seq("1", "2", "3", "4", "5"))
  }

  private val orders = Seq(
    Ord2(1, 10, "F", 100.0, day("1998-01-05")),
    Ord2(2, 10, "F", 300.0, day("1998-02-10")),
    Ord2(3, 11, "O", 300.0, day("1998-03-15")))
  private val customers = Seq(Cust2(10, "BUILDING"), Cust2(11, "AUTO"))

  test("segmentOrderExtremes breaks price ties by order key") {
    val r = Analytics.segmentOrderExtremes(df(orders), df(customers))
      .collect().map(x => x.getAs[String]("c_mktsegment") ->
        (x.getAs[Long]("max_order_key"), x.getAs[Long]("min_order_key"))).toMap
    assert(r("BUILDING") === ((2L, 1L)))
    assert(r("AUTO") === ((3L, 3L)))
  }

  test("orderDateFeatures: quarter/dow/last_day/week/add_months") {
    val r = Analytics.orderDateFeatures(df(orders)).orderBy("o_orderkey").collect()
    assert(r(0).getAs[Int]("o_quarter") === 1)
    assert(r(0).getAs[Int]("dow") === 2) // 1998-01-05 is a Monday; Spark 1=Sun
    assert(r(0).getAs[java.sql.Date]("month_end").toString === "1998-01-31")
    assert(r(0).getAs[java.sql.Date]("week_start").toString === "1998-01-05")
    assert(r(0).getAs[java.sql.Date]("next_month").toString === "1998-02-05")
  }

  private val parts = Seq(
    Part2(1, "crimson gear", "Brand12", "STANDARD"),
    Part2(2, "azure bolt", "Brand3", "ECONOMY"))

  test("partStringFeatures string surface") {
    val r = Analytics.partStringFeatures(df(parts)).orderBy("p_partkey").collect()
    assert(r(0).getAs[String]("name_upper") === "CRIMSON GEAR")
    assert(r(0).getAs[String]("brand_num") === "12")
    assert(r(0).getAs[Int]("lev_standard") === 0)
    assert(r(1).getAs[Int]("lev_standard") === 7) // ECONOMY -> STANDARD
    assert(r(1).getAs[String]("type_pad") === "___ECONOMY")
    assert(r(0).getAs[Int]("a_pos") === 11) // first 'a' in "crimson gear"
    assert(r(1).getAs[String]("name_prefix") === "azu")
    assert(r(1).getAs[String]("name_rev") === "tlob eruza")
  }

  private val lineitems = Seq(
    Li2(1, 1, 1, 5.0, 100.0, 0.1, 0.02, day("1998-01-10")),
    Li2(1, 2, 2, 3.0, 50.0, 0.0, 0.05, day("1998-02-10")),
    Li2(2, 1, 2, 7.0, 200.0, 0.2, 0.00, day("1998-02-20")))

  test("lineitemMetricsProfile unpivots 4 measures to long form") {
    val r = Analytics.lineitemMetricsProfile(df(lineitems)).collect()
      .map(x => x.getAs[String]("metric") ->
        (x.getAs[Long]("n_values"), x.getAs[Double]("min_value"), x.getAs[Double]("max_value"))).toMap
    assert(r.keySet === Set("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    assert(r("l_quantity") === ((3L, 3.0, 7.0)))
    assert(r("l_extendedprice") === ((3L, 50.0, 200.0)))
  }

  test("partsNotShippedIn anti-joins only the scoped month") {
    val r = Analytics.partsNotShippedIn(df(parts), df(lineitems), 1998, 2)
      .collect().map(_.getAs[Long]("p_partkey")).toSet
    assert(r === Set(1L)) // part 2 shipped in Feb; part 1 only in Jan
  }

  test("revenuePivotByStatus yields one cents-exact column per status") {
    val fact = Warehouse.factSales(
      df(lineitems).withColumn("l_suppkey", lit(1L)),
      df(orders).withColumn("o_orderpriority", lit("1-URGENT")),
      df(customers).withColumn("c_nationkey", lit(1))
        .withColumn("c_name", lit("x")).withColumn("c_acctbal", lit(0.0)),
      df(parts).withColumn("p_size", lit(1)).withColumn("p_retailprice", lit(1.0)),
      spark.createDataFrame(Seq((1L, "s", 1)))
        .toDF("s_suppkey", "s_name", "s_nationkey"),
      spark.createDataFrame(Seq((1, "GERMANY", 1)))
        .toDF("n_nationkey", "n_name", "n_regionkey"),
      spark.createDataFrame(Seq((1, "EUROPE"))).toDF("r_regionkey", "r_name"))
    val r = Warehouse.revenuePivotByStatus(fact).collect()
      .map(x => x.getAs[String]("c_mktsegment") ->
        (Option(x.getAs[Any]("rev_f")), Option(x.getAs[Any]("rev_o")))).toMap
    // AUTO's order 3 has no lineitems, so only BUILDING reaches the fact
    assert(r.keySet === Set("BUILDING"))
    // F = order1 (90 + 50) + order2 (200*(1-0.2) = 160) = 300
    assert(r("BUILDING")._1 === Some(300.0))
    assert(r("BUILDING")._2 === None)     // no O-status revenue for BUILDING
  }

  test("cosineNearDupsBlocked finds exact pairs only within the block") {
    val embs = Seq(
      Emb2(1, Seq(1f, 0f), 0), Emb2(2, Seq(1f, 0.01f), 0), // same label, ~parallel
      Emb2(3, Seq(1f, 0f), 1),                             // parallel but other label
      Emb2(4, Seq(0f, 1f), 0))                             // orthogonal
    val r = Similarity.cosineNearDupsBlocked(df(embs), "label", 0.9)
      .collect().map(x => (x.getAs[Long]("vec_a"), x.getAs[Long]("vec_b"))).toSet
    assert(r === Set((1L, 2L)))
  }
}
