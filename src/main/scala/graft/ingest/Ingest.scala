package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.quality.Quality
import graft.tables.LakeTable

/** The reference's ingestion pipeline (E1, SURVEY §3) re-expressed Spark-first:
  * CSV -> typed DataFrame -> quality checks -> curated lake table. The
  * reference pulled CSV over HTTP into pandas and re-inferred types
  * (`notebooks/01_dataLake_ingestion.ipynb:114-132`); we read CSV directly
  * into executors with explicit schemas (no driver-memory staging, no
  * inference pass over 100 TB).
  */
object Ingest {

  /** Explicit schemas for the reference e-commerce tables (FIXTURES.md §A;
    * types per `scripts/validate_dataset.py:8-43`). Dates parse to DateType
    * at ingest (the reference kept ISO strings end-to-end). */
  val schemas: Map[String, StructType] = Map(
    "customers" -> StructType(Seq(
      StructField("customer_id", LongType), StructField("first_name", StringType),
      StructField("last_name", StringType), StructField("email", StringType),
      StructField("signup_date", DateType), StructField("city", StringType),
      StructField("age", IntegerType))),
    "products" -> StructType(Seq(
      StructField("product_id", LongType), StructField("product_name", StringType),
      StructField("product_type", StringType), StructField("category", StringType),
      StructField("price", DoubleType), StructField("cost", DoubleType),
      StructField("available_stock", IntegerType))),
    "orders" -> StructType(Seq(
      StructField("order_id", LongType), StructField("customer_id", LongType),
      StructField("order_date", DateType), StructField("total_amount", DoubleType),
      StructField("payment_type", StringType), StructField("status", StringType))),
    "order_items" -> StructType(Seq(
      StructField("order_item_id", LongType), StructField("order_id", LongType),
      StructField("product_id", LongType), StructField("quantity", IntegerType),
      StructField("unit_price", DoubleType), StructField("line_total", DoubleType))))

  /** Schema'd CSV read (header row, explicit types — never inferSchema at
    * scale; a schema-inference pass is a full extra read of the data). */
  def readCsv(spark: SparkSession, path: String, table: String): DataFrame =
    spark.read.option("header", "true").schema(schemas(table)).csv(path)

  /** The reference's full quality gate for the e-commerce model (SURVEY
    * §2.11), as named violation DataFrames. */
  def qualityChecks(customers: DataFrame, products: DataFrame,
                    orders: DataFrame, orderItems: DataFrame): Seq[(String, DataFrame)] = Seq(
    "fk_orders_customer" -> Quality.checkForeignKey(orders, customers, "customer_id", "customer_id"),
    "fk_items_order" -> Quality.checkForeignKey(orderItems, orders, "order_id", "order_id"),
    "fk_items_product" -> Quality.checkForeignKey(orderItems, products, "product_id", "product_id"),
    "unique_customer_id" -> Quality.checkUnique(customers, "customer_id"),
    "unique_product_id" -> Quality.checkUnique(products, "product_id"),
    "unique_order_id" -> Quality.checkUnique(orders, "order_id"),
    "unique_order_item_id" -> Quality.checkUnique(orderItems, "order_item_id"),
    "price_ge_cost" -> Quality.checkPredicate(products, col("price") >= col("cost")),
    "line_total_consistent" -> Quality.checkTolerance(orderItems,
      col("quantity") * col("unit_price"), col("line_total")),
    "order_after_signup" -> Quality.checkPredicate(
      orders.join(customers.select("customer_id", "signup_date"), Seq("customer_id")),
      col("order_date") >= col("signup_date")))

  /** Metadata manifest sidecar (the reference's `data/raw/metadata.json`,
    * written by `src/generate_data.py:321-331`): row counts per table plus a
    * provenance timestamp, written next to the lake and readable back with
    * `spark.read.json`. */
  def writeManifest(spark: SparkSession, path: String,
                    counts: Map[String, Long], generatedAt: String): Unit = {
    val json = counts.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""n_$k": $v""" }
      .mkString("{", ", ", s""", "generated_at": "$generatedAt"}""")
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      json.getBytes("UTF-8"))
  }

  def readManifest(spark: SparkSession, path: String): org.apache.spark.sql.DataFrame =
    spark.read.json(path)

  /** End-to-end: read raw CSVs, run the gate, persist passing tables to the
    * lake (the reference's NB 01 flow). Returns violation counts. */
  def run(spark: SparkSession, rawDir: String, lake: LakeTable): Seq[(String, Long)] = {
    val customers = readCsv(spark, s"$rawDir/customers.csv", "customers")
    val products = readCsv(spark, s"$rawDir/products.csv", "products")
    val orders = readCsv(spark, s"$rawDir/orders.csv", "orders")
    val items = readCsv(spark, s"$rawDir/order_items.csv", "order_items")
    val report = Quality.report(qualityChecks(customers, products, orders, items))
    lake.write(customers, "customers")
    lake.write(products, "products")
    lake.write(orders, "orders")
    lake.write(items, "order_items")
    report
  }
}
