package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Money rounding that is bit-identical across engines.
  *
  * `round(x, 2)` on doubles disagrees between Spark (exact-BigDecimal
  * HALF_UP) and DuckDB at half-cent boundaries; `floor(x*100 + 0.5)/100` is
  * the same IEEE op sequence everywhere, so Spark and the DuckDB oracle
  * produce identical bits. Positive amounts only (half-up toward +inf).
  */
object money {
  /** Round a positive monetary double to cents, engine-portably. */
  def r2(c: Column): Column = floor(c * lit(100.0) + lit(0.5)) / lit(100.0)

  /** The DuckDB-SQL spelling of [[r2]] for oracle queries. */
  def r2Sql(expr: String): String = s"floor(($expr) * 100.0 + 0.5) / 100.0"

  /** Exact, order-independent money sum: convert each (already cents-rounded)
    * amount to integer cents, sum as BIGINT (associative — immune to the FP
    * add-order differences between Spark's partial/final aggregation and any
    * other engine), divide once at the end. Large subtotal rows (rollup grand
    * totals over millions of rows) stay bit-identical across engines; a
    * double-sum flips the last cent at half-cent boundaries. Long cents
    * overflow at ~9e16 dollars — beyond any 100 TB fact table's total. */
  def sumMoney(c: Column): Column =
    (sum(floor(c * lit(100.0) + lit(0.5)).cast("long")).cast("double") / lit(100.0))

  /** The DuckDB-SQL spelling of [[sumMoney]] for oracle queries. */
  def sumMoneySql(expr: String): String =
    s"CAST(sum(CAST(floor(($expr) * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0"
}
