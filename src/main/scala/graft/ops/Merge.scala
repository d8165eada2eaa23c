package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MERGE INTO / upsert and slowly-changing-dimension builds — the table
  * maintenance operators the reference's Delta layer implies but never wrote
  * (`/root/reference/notebooks/01_dataLake_ingestion.ipynb:571-574` persists
  * curated tables with `mode("overwrite")` only; a real lakehouse feeds them
  * incrementally with MERGE). Pure logical plans here; the committed-table
  * form lives in [[graft.tables.LakeTable.merge]].
  *
  * Scale notes (100 TB): the only wide operation in a merge is the anti-join
  * of target against the update keys — one shuffle on the merge key, or no
  * shuffle at all when the CDC batch is small enough to broadcast (the common
  * case, and Catalyst/AQE picks that automatically since we join against the
  * bare deduplicated key projection, not the full update rows). The union is
  * a no-op at plan level. SCD2 uses two windows over the SAME partitioning
  * key, so the whole build costs one shuffle.
  */
object Merge {

  /** The merged contents of `target` after applying `updates` keyed by
    * `keys`: matched rows are replaced by their update row (WHEN MATCHED
    * UPDATE SET *), unmatched update rows are inserted (WHEN NOT MATCHED
    * INSERT *), and update rows satisfying `deleteWhen` drop the matched
    * target row instead (WHEN MATCHED AND cond DELETE). A delete-marked row
    * whose key does NOT exist in the target is still inserted — Delta's
    * WHEN-NOT-MATCHED clause sees it before any delete clause can, so a
    * tombstone for an absent key behaves like an insert, not a no-op.
    *
    * The matched-test for delete-marked rows never shuffles the target: the
    * target's key projection is semi-joined against the (tiny, broadcast)
    * marked-key set, and only that dimension-sized result is deduplicated.
    *
    * `updates` must have at most one row per key (the MERGE precondition
    * Delta enforces at runtime; enforce with [[requireUniqueKeys]]). */
  def upsertPlan(target: DataFrame, updates: DataFrame, keys: Seq[String],
                 deleteWhen: Option[Column] = None): DataFrame = {
    val untouched = target.join(
      updates.select(keys.map(col): _*).distinct(), keys, "left_anti")
    val applied = deleteWhen match {
      case Some(cond) =>
        val del = coalesce(cond, lit(false))
        // keys of delete-marked update rows that exist in target: scan the
        // target's keys filtered by the broadcastable marked-key set (no
        // target shuffle), then dedup the small survivor set
        val markedKeys = updates.filter(del).select(keys.map(col): _*).distinct()
        val matchedMarked = target.select(keys.map(col): _*)
          .join(markedKeys, keys, "left_semi").distinct()
        // drop only matched marked rows; unmatched marked rows fall through
        // to the insert path (update keys are unique, so no unmarked row can
        // share a key with a marked one)
        updates.join(matchedMarked, keys, "left_anti")
      case None => updates
    }
    untouched.unionByName(applied.select(target.columns.toIndexedSeq.map(col): _*))
  }

  /** Violations of the one-update-row-per-key MERGE precondition (empty =
    * ok); run as a cheap pre-flight on the (small) update batch. */
  def requireUniqueKeys(updates: DataFrame, keys: Seq[String]): DataFrame =
    updates.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)

  /** SCD Type-2 dimension build from an event/change stream: one row per
    * (key, attribute-value run) with its validity interval.
    *
    * Consecutive equal values of `attrCol` collapse into one version row;
    * `valid_from` is the first `tsCol` of the run, `valid_to` the start of
    * the next run (null = current version, flagged `is_current`). Ordering
    * ties resolve on `tieCol` so the build is deterministic. `attrCol` is
    * assumed non-null (null-run semantics are undefined in SCD2).
    *
    * Both windows partition on `keyCol`, so Spark reuses one hash exchange
    * for the whole build. */
  def scd2(changes: DataFrame, keyCol: String, attrCol: String,
           tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val runs = changes
      .withColumn("graft_prev", lag(col(attrCol), 1).over(w))
      .filter(col("graft_prev").isNull || col("graft_prev") =!= col(attrCol))
      .select(col(keyCol), col(attrCol), col(tsCol).as("valid_from"), col(tieCol))
    val w2 = Window.partitionBy(keyCol).orderBy(col("valid_from"), col(tieCol))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .drop(tieCol)
  }
}
