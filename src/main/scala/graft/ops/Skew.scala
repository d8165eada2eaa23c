package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffled equi-joins.
  *
  * First line of defense is AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default) — it needs no code.
  * Salting is the explicit fallback for the case AQE can't fix: a *single*
  * join key so hot that one task would own it (power-law user_ids, null-ish
  * defaults). The big side scatters each hot key across `saltFactor`
  * sub-keys; the (smaller) other side replicates each row `saltFactor` times
  * so every sub-key still finds its match. Join semantics are unchanged;
  * shuffle skew drops by ~saltFactor on the salted keys.
  */
object Skew {

  private val saltCol = "__graft_salt"

  /** Salted inner equi-join of `big` (skewed) with `other` on `key`.
    * `hotKeys` limits replication to the known-hot keys (pass Nil to salt
    * every key; cheaper to list the hot ones from a prior count). */
  def saltedJoin(big: DataFrame, other: DataFrame, key: String,
                 saltFactor: Int, hotKeys: Seq[Any] = Nil): DataFrame = {
    val isHot: Column =
      if (hotKeys.isEmpty) lit(true)
      else col(key).isin(hotKeys: _*)
    // big side: hot keys get a random-but-deterministic salt in [0, n)
    val saltedBig = big.withColumn(saltCol,
      when(isHot, pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor)))
        .otherwise(lit(0L)))
    // other side: hot keys replicate across every salt value
    val salts = explode(
      when(isHot, sequence(lit(0L), lit(saltFactor - 1L)))
        .otherwise(array(lit(0L))))
    val saltedOther = other.withColumn(saltCol, salts)
    saltedBig.join(saltedOther, Seq(key, saltCol)).drop(saltCol)
  }

  /** Find the join keys hot enough to need salting: keys whose row count
    * exceeds `factor` × the mean per-key count. ONE map-side-combined
    * aggregate over the key column (the combine state is per-distinct-key,
    * not per-row) + a scalar mean — at 100 TB this is the cheap diagnostic
    * you run before choosing [[saltedJoin]]'s hotKeys list, instead of
    * guessing. Returns (key, n_rows, skew_ratio) ordered hottest first. */
  def detectHotKeys(df: DataFrame, key: String, factor: Double = 10.0): DataFrame = {
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("n_rows"))
    val mean = counts.agg(avg(col("n_rows")).as("mean_rows"))
    counts.crossJoin(broadcast(mean))
      .filter(col("n_rows") >= col("mean_rows") * factor)
      .select(col(key), col("n_rows"),
        round(col("n_rows") / col("mean_rows"), 2).as("skew_ratio"))
      .orderBy(desc("n_rows"), col(key))
  }

  /** [[detectHotKeys]] + [[saltedJoin]] composed: measure, then salt only
    * what needs it. The `hotKeys` list collects to the driver — it is
    * dimension-sized by construction (keys ≥ factor × mean are few, or the
    * join has bigger problems). */
  def autoSaltedJoin(big: DataFrame, other: DataFrame, key: String,
                     saltFactor: Int, factor: Double = 10.0): DataFrame = {
    val hot = detectHotKeys(big, key, factor).select(col(key))
      .collect().map(_.get(0)).toSeq
    if (hot.isEmpty) big.join(other, Seq(key))
    else saltedJoin(big, other, key, saltFactor, hot)
  }
}
