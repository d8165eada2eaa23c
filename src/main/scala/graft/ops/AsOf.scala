package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — an operator Spark's built-ins lack,
  * composed scale-first from union + window (SURVEY custom-operator
  * preference (a)): instead of a per-row range probe, both sides are
  * unioned, sorted once per partition key by event time, and each left row
  * picks up the last right row seen at or before its timestamp via
  * `last(..., ignoreNulls)` over an unbounded-preceding frame.
  *
  * Cost: ONE shuffle on the partition key + one sort — same complexity as a
  * sort-merge join, no matter how wide the time skew; a naive
  * join-on-range + max() does a quadratic range probe per key.
  */
object AsOf {

  /** For each left row, attach `rightValueCols` of the latest right row with
    * `right(timeCol) <= left(timeCol)` within the same `partitionKey`
    * (left-outer semantics: nulls when no prior right row exists). */
  def asofJoin(left: DataFrame, right: DataFrame, partitionKey: String,
               timeCol: String, rightValueCols: Seq[String]): DataFrame = {
    val payload = left.columns.filterNot(c => c == partitionKey || c == timeCol).toSeq
    // common layout: partition key, time, left payload (null on right rows),
    // right payload (null on left rows), side marker
    val l = left.select(
      (col(partitionKey) +: col(timeCol).as("__t") +: lit(1).as("__is_left") +:
        payload.map(col)) ++
        rightValueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)
    val r = right.select(
      (col(partitionKey) +: col(timeCol).as("__t") +: lit(0).as("__is_left") +:
        payload.map(c => lit(null).cast(left.schema(c).dataType).as(c))) ++
        rightValueCols.map(c => col(c).as(s"__r_$c")): _*)
    // right rows sort BEFORE left rows at the same timestamp, so a tie is
    // visible to the left row (<= semantics)
    val w = Window.partitionBy(partitionKey)
      .orderBy(col("__t"), col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l.unionByName(r).select(
      (col(partitionKey) +: col("__t") +: col("__is_left") +: payload.map(col)) ++
        rightValueCols.map(c =>
          last(col(s"__r_$c"), ignoreNulls = true).over(w).as(s"asof_$c")): _*)
    filled.filter(col("__is_left") === 1)
      .withColumnRenamed("__t", timeCol)
      .drop("__is_left")
  }

  /** Range join via bucketed equi-join: pairs (left, right) with
    * |left.v - right.v| <= width, found by joining on coarse buckets of size
    * `width` (each left row probes its own and both neighbor buckets) — an
    * equi-join shuffle instead of a cross-range predicate. */
  def rangeJoin(left: DataFrame, right: DataFrame, leftVal: Column,
                rightVal: Column, width: Double): DataFrame = {
    val lb = left.withColumn("__bucket",
      explode(array(floor(leftVal / width) - 1, floor(leftVal / width),
        floor(leftVal / width) + 1)))
    val rb = right.withColumn("__bucket", floor(rightVal / width))
    lb.join(rb, "__bucket")
      .filter(abs(leftVal - rightVal) <= width)
      .drop("__bucket")
  }
}
