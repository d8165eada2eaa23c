package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column<->Expression converters — the classic
  * (non-Connect) path for wiring custom Catalyst expressions into the Column
  * API in Spark 4.x. Only place in the codebase inside the Spark namespace. */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Truncate a DataFrame's LOGICAL lineage to a flat `LogicalRDD` node.
    *
    * Iterative DataFrame loops (e.g. connected components) otherwise build a
    * logical tree that references the previous round's tree several times, so
    * Catalyst re-analyzes an exponentially growing plan every round even
    * though execution reads the previous round from cache. This is the same
    * internal move `Dataset.checkpoint` makes — but WITHOUT writing data or
    * persisting anything: the returned frame's physical scan is the source
    * frame's executed plan (cache-substituted, since a fresh QueryExecution
    * is created here after any `persist` call), exposed as a single leaf.
    * Laziness is preserved; no job is triggered. */
  def flattenLineage(df: DataFrame): DataFrame = {
    val c = df.asInstanceOf[classic.Dataset[Row]]
    // fresh QueryExecution so a persist() issued after `df` was constructed
    // is picked up by the cache-substitution phase
    val fresh = classic.Dataset.ofRows(c.sparkSession, c.logicalPlan)
    val leaf = org.apache.spark.sql.execution.LogicalRDD
      .fromDataset(fresh.queryExecution.toRdd, fresh, isStreaming = false)
    classic.Dataset.ofRows(c.sparkSession, leaf)
  }
}
