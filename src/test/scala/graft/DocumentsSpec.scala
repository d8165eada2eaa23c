package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.ops.Documents

case class OrdRow(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
                  o_totalprice: Double, o_orderdate: Timestamp, o_orderpriority: String)
case class LineRow(l_orderkey: Long, l_linenumber: Int, l_partkey: Long,
                   l_quantity: Double, l_extendedprice: Double, l_discount: Double)

class DocumentsSpec extends SparkSpec {

  private val ts = Timestamp.valueOf("2024-01-01 00:00:00")
  private val orders = Seq(
    OrdRow(1, 100, "O", 50.0, ts, "1-URGENT"),
    OrdRow(2, 101, "F", 70.0, ts, "5-LOW"),
    OrdRow(3, 102, "O", 0.0, ts, "3-MEDIUM")) // no items -> dropped by nest
  private val lines = Seq(
    LineRow(1, 1, 7, 2.0, 30.0, 0.0), LineRow(1, 2, 8, 1.0, 20.0, 0.1),
    LineRow(2, 1, 7, 5.0, 70.0, 0.05))

  test("nest groups items under orders with deterministic array order") {
    val nested = Documents.nest(df(orders), df(lines))
    assert(nested.count() === 2)
    val o1 = nested.filter(nested("o_orderkey") === 1).select("items").collect()(0)
      .getSeq[org.apache.spark.sql.Row](0)
    assert(o1.map(_.getInt(0)) === Seq(1, 2)) // sorted by l_linenumber
  }

  test("unnest(nest) is the identity on the item multiset (property)") {
    val roundtrip = Documents.unnest(Documents.nest(df(orders), df(lines)))
    assert(roundtrip.count() === lines.size)
    val back = roundtrip.select("o_orderkey", "l_linenumber", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(back === lines.map(l => (l.l_orderkey, l.l_linenumber, l.l_partkey)).toSet)
  }

  test("JSON document export/read roundtrip (the MongoDB-layer replacement)") {
    val dir = Files.createTempDirectory("graft-docs").toString + "/docs"
    Documents.writeJsonDocs(Documents.nest(df(orders), df(lines)), dir)
    val back = Documents.readJsonDocs(spark, dir)
    assert(back.count() === 2)
    assert(back.columns.contains("items"))
    // documents carry the full embedded line-item array
    val n = back.selectExpr("size(items) AS n").collect().map(_.getInt(0)).sorted
    assert(n === Array(1, 2))
  }
}
