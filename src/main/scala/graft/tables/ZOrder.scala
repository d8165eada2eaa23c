package graft.tables

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: interleave the bits of per-column
  * rank buckets so rows close in EVERY clustering dimension land in the same
  * parquet files. Each written file then has a tight min/max footer range on
  * all clustered columns at once, and a multi-dimensional predicate prunes
  * most files/row-groups — a linear sort gives that for the leading column
  * only. This is the same layout idea Delta's OPTIMIZE ZORDER BY implements;
  * built here from plain Spark expressions (no UDFs — the z-value is
  * codegen'd shifts/ORs).
  *
  * Scale: bucket bounds come from one aggregate over the input (at 100 TB,
  * sample first — bounds only steer layout, exactness is irrelevant); the
  * write is one range-repartition shuffle, the same cost as any sorted write.
  */
object ZOrder {

  /** Per-column bounds used to scale values into bucket space. */
  final case class Bounds(min: Double, max: Double)

  /** Compute min/max bounds for `cols` in one pass. */
  def bounds(df: DataFrame, cols: Seq[String]): Seq[Bounds] = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("double")).as(s"min_$c"), max(col(c).cast("double")).as(s"max_$c")))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    cols.indices.map { i =>
      // an empty table or an all-null / non-castable column has no min/max —
      // fail with the column name, not an NPE from getDouble
      require(!r.isNullAt(2 * i) && !r.isNullAt(2 * i + 1),
        s"z-order bounds undefined for column '${cols(i)}' " +
          "(empty input or no castable non-null values)")
      Bounds(r.getDouble(2 * i), r.getDouble(2 * i + 1))
    }
  }

  /** `bitsPerCol`-bit bucket index of a numeric column within its bounds. */
  private def bucket(c: Column, b: Bounds, bitsPerCol: Int): Column = {
    val buckets = 1 << bitsPerCol
    val span = math.max(b.max - b.min, java.lang.Double.MIN_NORMAL)
    least(lit(buckets - 1), greatest(lit(0),
      floor((c.cast("double") - lit(b.min)) / lit(span) * lit(buckets)).cast("long")))
  }

  /** Morton z-value: bit i of column j lands at position i*ncols + j.
    * Pure shifts/ANDs/ORs — whole-stage-codegen'd, no UDF. */
  def zvalue(cols: Seq[Column], bs: Seq[Bounds], bitsPerCol: Int = 16): Column = {
    require(cols.nonEmpty && cols.length == bs.length)
    require(bitsPerCol * cols.length <= 63, "z-value must fit in a long")
    val n = cols.length
    val buckets = cols.zip(bs).map { case (c, b) => bucket(c, b, bitsPerCol) }
    val pieces = for {
      (bkt, j) <- buckets.zipWithIndex
      i <- 0 until bitsPerCol
    } yield shiftleft(shiftright(bkt, i).bitwiseAND(lit(1L)), i * n + j)
    pieces.reduce(_.bitwiseOR(_))
  }

  /** Repartition+sort `df` along the z-curve over `zCols` into `numFiles`
    * output partitions. The range partitioner keys on the z-value, so file
    * boundaries cut the curve into contiguous runs — each file covers a
    * small hyper-rectangle of the clustered columns. */
  def layout(df: DataFrame, zCols: Seq[String], numFiles: Int,
             bitsPerCol: Int = 16): DataFrame = {
    val zv = zvalue(zCols.map(col), bounds(df, zCols), bitsPerCol)
    df.withColumn("__zv", zv)
      .repartitionByRange(numFiles, col("__zv"))
      .sortWithinPartitions("__zv")
      .drop("__zv")
  }
}
