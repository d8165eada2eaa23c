package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.quality.Quality

case class Cust(customer_id: Long, email: String, age: Int)
case class Prod(product_id: Long, price: Double, cost: Double)
case class Ord(order_id: Long, customer_id: Long)
case class Item(order_item_id: Long, order_id: Long, quantity: Int,
                unit_price: Double, line_total: Double)

/** Quality suite per SURVEY §2.11 / FIXTURES.md unit-test seeds: clean
  * fixtures pass every check; each mutated fixture trips exactly its check. */
class QualitySpec extends SparkSpec {

  private val customers = Seq(Cust(1, "a@x.se", 30), Cust(2, "b@x.se", 40), Cust(3, "c@x.se", 50))
  private val orders = Seq(Ord(10, 1), Ord(11, 2), Ord(12, 3))

  test("checkForeignKey: clean data has no orphans") {
    assert(Quality.checkForeignKey(df(orders), df(customers), "customer_id", "customer_id").count() === 0)
  }

  test("checkForeignKey: dangling FK is flagged with the offending rows") {
    val bad = df(orders :+ Ord(13, 99))
    val v = Quality.checkForeignKey(bad, df(customers), "customer_id", "customer_id")
    assert(v.select("order_id").collect().map(_.getLong(0)).toSeq === Seq(13L))
  }

  test("checkUnique: duplicate key flagged with its multiplicity") {
    val v = Quality.checkUnique(df(customers :+ Cust(2, "dup@x.se", 41)), "customer_id")
    assert(v.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((2L, 2L)))
    assert(Quality.checkUnique(df(customers), "customer_id").count() === 0)
  }

  test("checkPredicate: price < cost flagged; null predicate counts as violation") {
    val prods = df(Seq(Prod(1, 10.0, 4.0), Prod(2, 5.0, 9.0)))
    val v = Quality.checkPredicate(prods, col("price") >= col("cost"))
    assert(v.select("product_id").collect().map(_.getLong(0)).toSeq === Seq(2L))
    // null price on row 1 joins the still-violating row 2 -> two violations
    val withNull = prods.withColumn("price",
      when(col("product_id") === 1, lit(null).cast("double")).otherwise(col("price")))
    assert(Quality.checkPredicate(withNull, col("price") >= col("cost")).count() === 2)
  }

  test("checkTolerance: line_total off by > 0.01 flagged, within tolerance passes") {
    val items = df(Seq(
      Item(1, 10, 2, 5.0, 10.0),      // exact
      Item(2, 10, 3, 2.5, 7.51),      // off by 0.01 -> pass (strict >)
      Item(3, 11, 1, 9.99, 12.0)))    // off by 2.01 -> fail
    val v = Quality.checkTolerance(df = items,
      actual = col("quantity") * col("unit_price"), expected = col("line_total"))
    assert(v.select("order_item_id").collect().map(_.getLong(0)).toSeq === Seq(3L))
  }

  test("nullProfile: one row, per-column null counts") {
    val d = df(customers).withColumn("email",
      when(col("customer_id") === 1, lit(null).cast("string")).otherwise(col("email")))
    val r = Quality.nullProfile(d).collect()(0)
    assert(r.getAs[Long]("customer_id_nulls") === 0)
    assert(r.getAs[Long]("email_nulls") === 1)
  }

  test("checkSchema: missing/extra/type-mismatch columns reported") {
    val expected = StructType(Seq(
      StructField("customer_id", LongType), StructField("email", StringType),
      StructField("age", IntegerType), StructField("city", StringType)))
    val rep = Quality.checkSchema(df(customers), expected)
    assert(!rep.ok)
    assert(rep.missing === Seq("city"))
    assert(rep.extra === Seq.empty)
    val rep2 = Quality.checkSchema(df(customers).withColumn("age", col("age").cast("long")),
      expected.copy())
    assert(rep2.typeMismatch === Seq("age"))
    assert(Quality.checkSchema(df(customers),
      StructType(df(customers).schema.fields)).ok)
  }

  test("reference raw CSVs pass the quality gate (zero-violation fixture)") {
    val raw = "/root/reference/data/raw"
    if (new java.io.File(s"$raw/customers.csv").exists()) {
      val customers = graft.ingest.Ingest.readCsv(spark, s"$raw/customers.csv", "customers")
      val products = graft.ingest.Ingest.readCsv(spark, s"$raw/products.csv", "products")
      assert(Quality.checkUnique(customers, "customer_id").count() === 0)
      assert(Quality.checkUnique(products, "product_id").count() === 0)
      assert(Quality.checkPredicate(products, col("price") >= col("cost")).count() === 0)
      assert(Quality.nullProfile(customers).collect()(0).toSeq.forall(_ == 0L))
      assert(customers.count() === 10000)
      assert(products.count() === 2000)
    }
  }

  test("observed metrics arrive from the SAME action, no second scan") {
    val data = df(Seq(
      Cust(1, "a@x.se", 30), Cust(2, null, 40), Cust(3, null, 50)))
    val (instrumented, obs) = Quality.observed(data, Seq("email", "age"))
    // one action drives both the consumer AND the metrics
    assert(instrumented.count() === 3)
    val m = obs.get
    assert(m("n_rows") === 3L)
    assert(m("email_nulls") === 2L)
    assert(m("age_nulls") === 0L)
  }
}
