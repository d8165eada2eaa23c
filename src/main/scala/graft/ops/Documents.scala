package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document-model projection: relational <-> nested, replacing the reference's
  * MongoDB layer (`/root/reference/notebooks/02_document_db_mongodb.ipynb:222-246`
  * builds order documents with `collect_list(struct(...))`, then collects the
  * whole result to the driver for PyMongo `insert_many` — a scalability bug we
  * fix by writing JSON from the executors instead).
  *
  * Determinism: `collect_list` order is nondeterministic across shuffles, so
  * the nest operator sorts each array (`array_sort` on structs orders by the
  * leading field, here the unique line number) — required for oracle
  * hash-compare and for stable downstream hashing at scale.
  */
object Documents {

  private val orderCols = Seq(
    "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
    "o_orderdate", "o_orderpriority")

  private val itemFields = Seq(
    "l_linenumber", "l_partkey", "l_quantity", "l_extendedprice", "l_discount")

  /** Orders with an `items: array<struct<...>>` column.
    *
    * Aggregate-then-join, not join-then-group: collecting the item arrays
    * BEFORE the join shuffles only the narrow item fields keyed by order key,
    * and the subsequent equi-join needs no re-shuffle of that side (it is
    * already hash-partitioned on the key). Grouping after the join would
    * shuffle every joined row at full order+item width and re-group on six
    * wide columns. Inner-join semantics are identical: orders without items
    * drop either way. */
  def nest(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val items = lineitem
      .groupBy(col("l_orderkey"))
      .agg(array_sort(collect_list(struct(itemFields.map(col): _*))).as("items"))
    orders.join(items, col("o_orderkey") === col("l_orderkey"))
      .select(orderCols.map(col) :+ col("items"): _*)
  }

  /** Inverse of [[nest]]: explode the items array back to line grain. */
  def unnest(nested: DataFrame): DataFrame = {
    val exploded = nested.select(
      orderCols.map(col) :+ explode(col("items")).as("item"): _*)
    exploded.select(orderCols.map(col) ++ itemFields.map(f => col(s"item.$f")): _*)
  }

  /** Executor-side JSON document export (replaces the reference's driver-side
    * `toPandas()` + PyMongo sink, `notebooks/02:269-322`). */
  def writeJsonDocs(nested: DataFrame, outDir: String): Unit =
    nested.write.mode("overwrite").json(outDir)

  /** Document source: read the exported JSON back as a DataFrame
    * (capability S7 — the MongoDB `find()` equivalent). */
  def readJsonDocs(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    spark.read.json(dir)

  /** XML document interchange (the second serialization surface beside
    * JSON): serialize each order to an XML fragment with `to_xml`, parse it
    * back with `from_xml` against an explicit schema, and re-flatten. Both
    * directions are per-row codegen'd expressions — no shuffle; at scale
    * this is the shape of an XML export/ingest pipe (write the `xml` column
    * with `df.write.text`, read it back the same way). Restricted to
    * long/string/double fields: those round-trip bit-exactly through XML
    * text; dates/timestamps would depend on session-zone formatting. */
  def xmlRoundtrip(orders: DataFrame): DataFrame = {
    val schema = "o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE"
    orders
      .select(to_xml(struct(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice"))).as("xml"))
      .select(from_xml(col("xml"), lit(schema)).as("doc"))
      .select(col("doc.o_orderkey").as("o_orderkey"),
        col("doc.o_orderstatus").as("o_orderstatus"),
        col("doc.o_totalprice").as("o_totalprice"))
  }
}
