package graft.tables

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized aggregate over a lake table — the
  * view-maintenance pattern that makes dashboard refresh O(delta) instead
  * of O(history): the view table stores additive partials (count + exact
  * cents sum per key); `refresh` reads ONLY the base commits appended since
  * the last refresh (via [[LakeTable.readChanges]]), aggregates the delta,
  * and folds it into the dimension-sized view. A non-append commit in the
  * range (overwrite/compact rewrites history) is detected and triggers a
  * full rebuild — correctness never depends on the fast path applying.
  *
  * The applied base version is tracked in a sidecar next to the view table;
  * refresh is idempotent (same version -> no-op).
  */
object Materialize {

  private def metaPath(lake: LakeTable, view: String) =
    Paths.get(lake.warehouse, s"$view.mat.json")

  private def appliedVersion(lake: LakeTable, view: String): Option[Long] =
    if (!Files.exists(metaPath(lake, view))) None
    else Some(new String(Files.readAllBytes(metaPath(lake, view)), "UTF-8")
      .trim.stripPrefix("{\"appliedVersion\":").stripSuffix("}").trim.toLong)

  private def writeApplied(lake: LakeTable, view: String, v: Long): Unit =
    Files.write(metaPath(lake, view),
      s"""{"appliedVersion":$v}""".getBytes("UTF-8"))

  private def aggregate(rows: DataFrame, keys: Seq[String],
                        valueCol: String): DataFrame =
    rows.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n_rows"),
      sum(floor(col(valueCol) * lit(100.0) + lit(0.5)).cast("long")).as("cents"))

  /** Create or incrementally refresh `view` = sum/count of `base` grouped
    * by `keys`. Returns the base version the view now reflects. */
  def refresh(lake: LakeTable, base: String, view: String,
              keys: Seq[String], valueCol: String): Long = {
    val latest = lake.latestVersion(base).getOrElse(
      throw new IllegalArgumentException(s"no such table: $base"))
    def fullRebuild(): Unit = {
      lake.write(aggregate(lake.read(base), keys, valueCol), view, "overwrite")
      writeApplied(lake, view, latest)
    }
    appliedVersion(lake, view) match {
      case Some(v) if v == latest => () // idempotent no-op
      case Some(v) =>
        try {
          val delta = aggregate(lake.readChanges(base, v), keys, valueCol)
          val folded = lake.read(view).unionByName(delta)
            .groupBy(keys.map(col): _*)
            .agg(sum(col("n_rows")).as("n_rows"), sum(col("cents")).as("cents"))
          lake.write(folded, view, "overwrite")
          writeApplied(lake, view, latest)
        } catch {
          // non-append commits in range: incremental semantics undefined
          case _: IllegalArgumentException => fullRebuild()
        }
      case None => fullRebuild()
    }
    latest
  }

  /** The view with a readable money column (exact cents -> dollars). */
  def readView(lake: LakeTable, view: String, keys: Seq[String]): DataFrame =
    lake.read(view).select(
      (keys.map(col) :+ col("n_rows") :+
        (col("cents").cast("double") / lit(100.0)).as("total")): _*)
}
