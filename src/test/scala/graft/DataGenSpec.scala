package graft

import org.apache.spark.sql.functions._

import graft.ingest.DataGen

/** The seeded generator must reproduce the reference generator's published
  * scale (10k / 2k / 100k), its distribution shapes, and its integrity
  * contracts — deterministically. */
class DataGenSpec extends SparkSpec {

  private lazy val cfg = DataGen.Config()
  private lazy val customers = DataGen.customers(spark, cfg).cache()
  private lazy val products = DataGen.products(spark, cfg).cache()
  private lazy val (orders, items) = {
    val (o, i) = DataGen.ordersAndItems(spark, cfg)
    (o.cache(), i.cache())
  }

  test("published row counts: 10k customers / 2k products / 100k orders") {
    assert(customers.count() === 10000L)
    assert(products.count() === 2000L)
    assert(orders.count() === 100000L)
  }

  test("generation is deterministic under the seed") {
    def checksum() = DataGen.products(spark, cfg)
      .select(xxhash64(col("product_id"), col("product_name"), col("price")).as("h"))
      .agg(expr("bit_xor(h)")).head().getLong(0)
    assert(checksum() === checksum())
  }

  test("ages are clipped N(35,10): bounds hold, mean lands near 35") {
    val r = customers.agg(min("age"), max("age"), avg("age")).head()
    assert(r.getInt(0) >= 18 && r.getInt(1) <= 90)
    assert(math.abs(r.getDouble(2) - 35.0) < 1.0)
  }

  test("prices are LogNormal(2.8, 0.8): ln-price moments match") {
    val r = products.agg(avg(log(col("price"))), stddev(log(col("price")))).head()
    assert(math.abs(r.getDouble(0) - 2.8) < 0.08, s"ln mean ${r.getDouble(0)}")
    assert(math.abs(r.getDouble(1) - 0.8) < 0.08, s"ln std ${r.getDouble(1)}")
  }

  test("every product_type maps to its authoritative category") {
    val m = DataGen.ProductTypeToCategory.toMap
    val bad = products.collect().count(r =>
      m(r.getAs[String]("product_type")) != r.getAs[String]("category"))
    assert(bad === 0)
  }

  test("cost sits in the 40-70% band of price") {
    val bad = products.filter(
      col("cost") < col("price") * 0.40 - 0.01 ||
        col("cost") > col("price") * 0.70 + 0.01).count()
    assert(bad === 0L)
  }

  test("status and payment mixes match the reference probabilities") {
    val n = orders.count().toDouble
    val st = orders.groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1) / n).toMap
    assert(math.abs(st("completed") - 0.95) < 0.01)
    assert(math.abs(st("cancelled") - 0.03) < 0.01)
    assert(math.abs(st("returned") - 0.02) < 0.01)
    val pay = orders.groupBy("payment_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1) / n).toMap
    assert(math.abs(pay("card") - 0.60) < 0.01)
    assert(math.abs(pay("swish") - 0.10) < 0.01)
  }

  test("product popularity is Zipf-shaped: rank-1 dominates, long tail") {
    val counts = items.groupBy("product_id").count()
      .orderBy(desc("count")).limit(100).collect().map(_.getLong(1))
    // 1/k shape: top rank >= ~5x rank-20, and the head is a large multiple
    // of the uniform expectation (total_items / 2000)
    val total = items.count()
    assert(counts(0) > counts(19) * 4, s"head ${counts(0)} vs ${counts(19)}")
    assert(counts(0) > 20L * total / 2000L, s"head ${counts(0)} of $total")
  }

  test("referential integrity and date ordering hold") {
    val orphanCust = orders.join(customers,
      orders("customer_id") === customers("customer_id"), "left_anti").count()
    val orphanProd = items.join(products,
      items("product_id") === products("product_id"), "left_anti").count()
    assert(orphanCust === 0L && orphanProd === 0L)
    val badDate = orders.join(customers, Seq("customer_id"))
      .filter(col("order_date") < col("signup_date")).count()
    assert(badDate === 0L)
  }

  test("line totals and order totals reconcile at 2 dp") {
    val bad = items.filter(
      abs(col("line_total") - round(col("quantity") * col("unit_price"), 2))
        > 0.001).count()
    assert(bad === 0L)
    val recon = orders.join(
      items.groupBy("order_id").agg(round(sum("line_total"), 2).as("s")),
      Seq("order_id"))
      .filter(abs(col("total_amount") - col("s")) > 0.001).count()
    assert(recon === 0L)
  }

  test("generator -> CSV -> ingest quality gate -> lake closes clean") {
    val small = DataGen.Config(nCustomers = 200L, nProducts = 50L, nOrders = 1000L)
    val dir = java.nio.file.Files.createTempDirectory("graft-datagen").toString
    DataGen.writeCsvDataset(spark, dir, small)
    val lake = new graft.tables.LakeTable(spark,
      java.nio.file.Files.createTempDirectory("graft-datagen-lake").toString)
    val violations = graft.ingest.Ingest.run(spark, dir, lake)
    assert(violations.forall(_._2 === 0L), violations.mkString(", "))
    assert(lake.read("customers").count() === 200L)
    assert(lake.read("products").count() === 50L)
    assert(lake.read("orders").count() === 1000L)
    val manifest = graft.ingest.Ingest.readManifest(spark, s"$dir/metadata.json")
    assert(manifest.select("n_orders").head().getLong(0) === 1000L)
  }

  test("items per order follow the reference mix; product ids distinct") {
    val per = items.groupBy("order_id").agg(
      count(lit(1)).as("n"), countDistinct("product_id").as("nd"))
    assert(per.filter(col("n") =!= col("nd")).count() === 0L)
    val n = per.count().toDouble
    val one = per.filter(col("n") === 1).count() / n
    assert(math.abs(one - 0.50) < 0.03, s"P(1 item) $one")
  }
}
