package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.tables.{LakeTable, Tables}

/** Scale-mechanics evidence: the plan-shape claims the engine makes for
  * 100 TB operation, asserted on real plans. */
class ScaleSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("bucketed fact tables join with ZERO shuffle exchanges") {
    // default spark-warehouse dir (spark.sql.warehouse.dir is static conf)
    val li = Tables.lineitem(spark, d)
    val o = Tables.orders(spark, d)
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("o_bucketed")
    // disable broadcast so the join strategy must rely on co-location
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(sum("l_quantity"))
      j.collect()
      // AdaptiveSparkPlan prints Final + Initial sections; count only Final
      val plan = j.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
      // the join itself is shuffle-free (bucket co-location); only the final
      // groupBy on a different key may exchange
      assert("SortMergeJoin".r.findFirstIn(plan).isDefined, plan.take(400))
      assert(shuffles <= 1, s"expected <=1 exchange (the agg), got $shuffles\n${plan.take(1200)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("date-partitioned lake table prunes partitions on read") {
    val lake = new LakeTable(spark, Files.createTempDirectory("graft-part").toString)
    val o = Tables.orders(spark, d)
      .withColumn("order_month", date_format(col("o_orderdate"), "yyyy-MM"))
    lake.write(o, "orders_by_month", partitionBy = Seq("order_month"))
    val back = lake.read("orders_by_month")
    val pruned = back.filter(col("order_month") === "1995-01")
    pruned.collect()
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(order_month"), plan.take(600))
    // pruned scan READS strictly fewer files (inputFiles lists pre-pruning,
    // so use the scan's runtime metric)
    val scan = pruned.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.metrics("numFiles").value < back.inputFiles.length)
  }

  test("quality checks never move table payloads: anti-join shuffles keys only") {
    val li = Tables.lineitem(spark, d)
    val o = Tables.orders(spark, d)
    val v = graft.quality.Quality.checkForeignKey(li, o, "l_orderkey", "o_orderkey")
    v.count()
    val plan = v.queryExecution.executedPlan.toString
    // parent side scans only its key column
    assert(plan.contains("ReadSchema: struct<o_orderkey:bigint>"), plan.take(1200))
  }

  test("salted join equals the plain join on a skewed key distribution") {
    import graft.ops.Skew
    // 90% of lineitem rows share one hot order key
    val li = Tables.lineitem(spark, d)
    val hot = li.limit(1).select("l_orderkey").collect()(0).getLong(0)
    val skewed = li.withColumn("l_orderkey",
      when(rand(7) < 0.9, lit(hot)).otherwise(col("l_orderkey")))
    val o = Tables.orders(spark, d)
    val plain = skewed.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(sum("l_quantity").as("q"))
    val salted = Skew.saltedJoin(
        skewed, o.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey",
        saltFactor = 8, hotKeys = Seq(hot))
      .groupBy("o_orderstatus").agg(sum("l_quantity").as("q"))
    val a = plain.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val b = salted.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(a.keySet === b.keySet)
    a.foreach { case (k, v) => assert(math.abs(v - b(k)) < 1e-6, k) }
  }

  test("detectHotKeys finds exactly the planted hot key; autoSalt matches plain") {
    import graft.ops.Skew
    import spark.implicits._
    // key 7 owns ~50% of rows; everything else is uniform
    val rows = (1L to 2000L).map(i => (if (i % 2 == 0) 7L else i % 100, i))
    val big = rows.toDF("k", "payload")
    val hot = Skew.detectHotKeys(big, "k", factor = 10.0).collect()
    assert(hot.map(_.getLong(0)).toSeq === Seq(7L))
    // 1000 even-i rows + the 20 odd rows with i % 100 == 7
    assert(hot.head.getLong(1) === 1020L)
    val other = (0L to 100L).map(k => (k, s"dim$k")).toDF("k", "name")
    val auto = Skew.autoSaltedJoin(big, other, "k", saltFactor = 4)
      .groupBy("name").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = big.join(other, Seq("k"))
      .groupBy("name").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(auto === plain)
  }
}
