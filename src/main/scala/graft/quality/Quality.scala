package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Declarative data-quality suite — the productized form of the reference's
  * dataset validator (`/root/reference/scripts/validate_dataset.py`, SURVEY
  * §2.11). Every check returns a lazy violations DataFrame ("pass" == empty),
  * so checks compose into one Spark job graph and scale to 100 TB: only
  * violation counts/samples ever reach the driver, never full tables (the
  * reference's validator was single-process pandas).
  */
object Quality {

  /** Missing/extra columns vs an expected schema
    * (ref `scripts/validate_dataset.py:89-97`). Name-level check like the
    * reference; type mismatches are reported separately. */
  def checkSchema(df: DataFrame, expected: StructType): SchemaReport = {
    val actual = df.schema.map(f => f.name -> f.dataType).toMap
    val exp = expected.map(f => f.name -> f.dataType).toMap
    SchemaReport(
      missing = (exp.keySet -- actual.keySet).toSeq.sorted,
      extra = (actual.keySet -- exp.keySet).toSeq.sorted,
      typeMismatch = exp.keySet.intersect(actual.keySet).toSeq.sorted
        .filter(c => exp(c) != actual(c)))
  }

  final case class SchemaReport(missing: Seq[String], extra: Seq[String],
                                typeMismatch: Seq[String]) {
    def ok: Boolean = missing.isEmpty && extra.isEmpty && typeMismatch.isEmpty
  }

  /** Referential integrity: child rows whose key has no parent — the engine
    * form of the validator's set differences (`validate_dataset.py:112-135`)
    * as a left-anti join (one shuffle; broadcast when parent is small). */
  def checkForeignKey(child: DataFrame, parent: DataFrame,
                      childKey: String, parentKey: String): DataFrame = {
    // alias the parent key so child/parent tables sharing the key name
    // (the common FK convention) resolve unambiguously
    val pk = parent.select(col(parentKey).as("__graft_parent_key"))
    child.join(pk, child(childKey) === pk("__graft_parent_key"), "left_anti")
  }

  /** Key-uniqueness violations: keys appearing more than once
    * (ref `validate_dataset.py:178-189`). */
  def checkUnique(df: DataFrame, key: String): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n_dups")).filter(col("n_dups") > 1)

  /** Rows violating an invariant predicate (e.g. price >= cost,
    * ref `validate_dataset.py:138-144`). Null predicate results count as
    * violations — an unknown invariant is not a pass. */
  def checkPredicate(df: DataFrame, invariant: Column): DataFrame =
    df.filter(!coalesce(invariant, lit(false)))

  /** Numeric-consistency tolerance check, the engine form of
    * |quantity*unit_price - line_total| > eps (`validate_dataset.py:169-176`). */
  def checkTolerance(df: DataFrame, actual: Column, expected: Column,
                     eps: Double = 0.01): DataFrame =
    df.filter(abs(actual - expected) > eps)

  /** Per-column null counts in a single-row aggregate
    * (ref `notebooks/01_dataLake_ingestion.ipynb:316-320`) — one shuffle-free
    * partial agg + final reduce regardless of table width. */
  def nullProfile(df: DataFrame): DataFrame =
    df.select(df.columns.map(c =>
      sum(col(c).isNull.cast("long")).as(s"${c}_nulls")).toSeq: _*)

  /** Run a batch of named checks and return (name -> violation count);
    * the only driver-side materialization is one Long per check. */
  def report(checks: Seq[(String, DataFrame)]): Seq[(String, Long)] =
    checks.map { case (name, df) => name -> df.count() }

  /** Two-dataset reconciliation: FULL OUTER join `a` and `b` on `key` and
    * classify every key as present in both / only_a / only_b, with the
    * value delta for matched rows (cents-rounded). The standard
    * restatement / migration-parity check; one shuffle on the key (or none
    * when both sides are bucketed on it). */
  def reconcile(a: DataFrame, b: DataFrame, key: String,
                valueCol: String): DataFrame = {
    val l = a.select(col(key).as("a_key"), col(valueCol).as("a_value"))
    val r = b.select(col(key).as("b_key"), col(valueCol).as("b_value"))
    l.join(r, col("a_key") === col("b_key"), "full_outer")
      .select(
        coalesce(col("a_key"), col("b_key")).as(key),
        when(col("a_key").isNull, "only_b")
          .when(col("b_key").isNull, "only_a")
          .otherwise("both").as("status"),
        when(col("a_key").isNotNull && col("b_key").isNotNull,
          round(col("b_value") - col("a_value"), 2)).as("value_diff"))
  }

  /** Attach single-pass observability metrics to a plan: row count plus a
    * null count per profiled column, collected DURING whatever action the
    * caller runs next (a lake write, an export) — at 100 TB the difference
    * between free metrics and a second full scan. Read the metrics from the
    * returned [[org.apache.spark.sql.Observation]] after the action:
    * `obs.get("n_rows")`. */
  def observed(df: DataFrame, profileCols: Seq[String])
      : (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation()
    val aggs = count(lit(1)).as("n_rows") +:
      profileCols.map(c => sum(col(c).isNull.cast("long")).as(s"${c}_nulls"))
    (df.observe(obs, aggs.head, aggs.tail: _*), obs)
  }

  /** Benford first-digit profile of a positive money column — the classic
    * fabricated-data screen (natural multiplicative processes follow
    * P(d) = log10(1 + 1/d); uniform or hand-entered values don't). The
    * leading digit is extracted from the EXACT integer cents rendered as a
    * string — no float log10 near power-of-ten boundaries, where one ulp
    * flips the digit. One |digits|-row aggregate; share + expected each
    * cost a single rounded division. */
  def benfordProfile(df: DataFrame, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = floor(col(valueCol) * lit(100.0) + lit(0.5)).cast("long")
    val digit = substring(cents.cast("string"), 1, 1).cast("int")
    val w = Window.partitionBy()
    // gate on the CENTS being positive, not the raw value: 0 < v < 0.005
    // rounds to zero cents and would emit a bogus digit-0 row whose
    // benford_expected is log10(inf)
    df.filter(cents > 0)
      .select(digit.as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
      .select(col("digit"), col("n"),
        round(col("n").cast("double") /
          sum(col("n")).over(w).cast("double"), 6).as("share"),
        round(log10(lit(1.0) + lit(1.0) / col("digit").cast("double")), 6)
          .as("benford_expected"))
  }

  /** Pseudonymizing projection for sharing datasets: stable one-way hash of
    * identifying strings (sha2-256 — joinable across exports, not
    * reversible), initial+mask display form, and numeric generalization
    * (bucketed balance — the k-anonymity move). Pure codegen'd map, no
    * shuffle; the column-masking primitive a governed lakehouse applies at
    * read time. */
  def maskCustomerPii(customer: DataFrame): DataFrame =
    customer.select(col("c_custkey"),
      sha2(col("c_name"), 256).as("name_hash"),
      concat(expr("left(c_name, 1)"), lit("***")).as("name_masked"),
      floor(col("c_acctbal") / lit(1000.0)).cast("long").as("acctbal_bucket"))
}
