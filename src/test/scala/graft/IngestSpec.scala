package graft

import java.nio.file.Files

import graft.ingest.Ingest
import graft.tables.LakeTable

/** End-to-end run of the reference's NB 01 pipeline (CSV -> quality gate ->
  * lake) over tiny synthetic raw CSVs, including one planted violation per
  * check family. */
class IngestSpec extends SparkSpec {

  private def writeRaw(dir: String): Unit = {
    def w(name: String, lines: Seq[String]): Unit =
      Files.write(java.nio.file.Paths.get(dir, name),
        lines.mkString("\n").getBytes("UTF-8"))
    w("customers.csv", Seq(
      "customer_id,first_name,last_name,email,signup_date,city,age",
      "1,Anna,Berg,a@x.se,2023-01-01,Stockholm,30",
      "2,Bo,Lund,b@x.se,2023-06-01,Malmö,40"))
    w("products.csv", Seq(
      "product_id,product_name,product_type,category,price,cost,available_stock",
      "10,Soft Shampoo 250ml,Shampoo,Hair Care,12.50,6.00,100",
      "11,Matte Lipstick 5g,Lipstick,Makeup,20.00,25.00,50")) // price < cost!
    w("orders.csv", Seq(
      "order_id,customer_id,order_date,total_amount,payment_type,status",
      "100,1,2023-02-01,25.00,card,completed",
      "101,2,2023-01-01,20.00,swish,completed",   // before signup!
      "102,9,2023-07-01,12.50,card,completed"))   // dangling customer!
    w("order_items.csv", Seq(
      "order_item_id,order_id,product_id,quantity,unit_price,line_total",
      "1000,100,10,2,12.50,25.00",
      "1001,101,11,1,20.00,20.00",
      "1002,102,10,1,12.50,99.00"))               // line_total off!
  }

  test("full pipeline: typed read, violations reported, lake persisted") {
    val raw = Files.createTempDirectory("graft-raw").toString
    val wh = Files.createTempDirectory("graft-wh").toString
    writeRaw(raw)
    val lake = new LakeTable(spark, wh)
    val report = Ingest.run(spark, raw, lake).toMap
    assert(report("fk_orders_customer") === 1)
    assert(report("price_ge_cost") === 1)
    assert(report("order_after_signup") === 1)
    assert(report("line_total_consistent") === 1)
    assert(report("unique_customer_id") === 0)
    assert(report("fk_items_order") === 0)
    // curated tables landed with typed schemas and validate cleanly
    assert(lake.read("customers").schema("signup_date").dataType.typeName === "date")
    Seq("customers", "products", "orders", "order_items").foreach { t =>
      val (ok, detail) = lake.validate(t)
      assert(ok, s"$t: $detail")
    }
  }

  test("manifest sidecar roundtrips row counts (reference metadata.json)") {
    val dir = Files.createTempDirectory("graft-manifest").toString + "/metadata.json"
    Ingest.writeManifest(spark, dir,
      Map("customers" -> 2L, "orders" -> 3L), "2026-08-12T00:00:00Z")
    val back = Ingest.readManifest(spark, dir).collect()(0)
    assert(back.getAs[Long]("n_customers") === 2L)
    assert(back.getAs[Long]("n_orders") === 3L)
    assert(back.getAs[String]("generated_at") === "2026-08-12T00:00:00Z")
  }
}
