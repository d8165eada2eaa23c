package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Source/sink format coverage beyond parquet: ORC (columnar, pushdown),
  * CSV and JSON round trips with explicit schemas. */
class FormatsSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("ORC round trip preserves data and pushes predicates to the scan") {
    val dir = Files.createTempDirectory("graft-orc").toString + "/orders"
    val orders = Tables.orders(spark, d)
    orders.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() === orders.count())
    val q = back.filter(col("o_orderstatus") === "F").select("o_orderkey")
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,F)"),
      plan.take(600))
    // column pruning reaches the ORC scan too
    assert(plan.contains("ReadSchema: struct<o_orderkey:bigint,o_orderstatus:string>"),
      plan.take(600))
  }

  test("CSV round trip with explicit schema keeps types") {
    val dir = Files.createTempDirectory("graft-csv").toString + "/customer"
    val customer = Tables.customer(spark, d)
    customer.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true")
      .schema(Tables.schemas("customer")).csv(dir)
    assert(back.schema === Tables.schemas("customer"))
    assert(back.agg(sum("c_acctbal")).collect()(0).getDouble(0) ===
      customer.agg(sum("c_acctbal")).collect()(0).getDouble(0))
  }

  test("JSON lines round trip (document interchange format)") {
    val dir = Files.createTempDirectory("graft-json").toString + "/nation"
    val nation = Tables.nation(spark, d)
    nation.write.mode("overwrite").json(dir)
    val back = spark.read.schema(Tables.schemas("nation")).json(dir)
    assert(back.orderBy("n_nationkey").collect().map(_.getString(1)).toSeq ===
      nation.orderBy("n_nationkey").collect().map(_.getString(1)).toSeq)
  }
}
