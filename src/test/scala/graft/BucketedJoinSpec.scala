package graft

import org.apache.spark.sql.functions._

/** The 100 TB co-location story made concrete: lineitem and orders written
  * bucketed (and sorted) by the order key join WITHOUT any Exchange — the
  * shuffle that dominates the star join at scale disappears because both
  * sides are already hash-distributed on the join key at write time.
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed-by-key tables join with zero shuffles") {
    val d = "/root/testdata/sf0.001"
    val li = graft.tables.Tables.lineitem(spark, d)
    val o = graft.tables.Tables.orders(spark, d)
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_bucketed")
    // tiny test tables would broadcast; the bucketed path under audit is the
    // sort-merge one that the optimizer picks at real fact-fact scale
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey").agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      val section = plan.split("== Initial Plan ==").last
      val exchanges = section.linesIterator.count(_.contains("Exchange hashpartitioning"))
      // SortMergeJoin straight over the bucketed scans; the groupBy on the
      // same key also reuses the bucket distribution
      assert(exchanges === 0, s"expected a shuffle-free plan:\n${plan.take(800)}")
      assert(plan.contains("SortMergeJoin"), plan.take(400))
      // same result as the unbucketed join
      val expected = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey").agg(count(lit(1)).as("n"))
      assert(joined.exceptAll(expected).isEmpty && expected.exceptAll(joined).isEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
