package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.{CosineSimilarity, DotProduct}
import graft.tables.Tables

/** One-call SQL entry point: a user of the reference switches engines by
  * pointing [[open]] at a data directory and keeps writing plain SQL —
  * every table is registered as a temp view under its reference name, and
  * the graft SQL functions (`cosine_sim`, `dot_product`) are installed on
  * the live session (the post-hoc twin of the
  * `spark.sql.extensions=graft.functions.GraftExtensions` build-time path;
  * sessions built with the extension also get the cosine fusion rule).
  *
  * Views are lazy plans over the columnar parquet — registering them costs
  * nothing and every query through [[sql]] still gets pushdown + pruning at
  * the scan.
  */
object Engine {

  def open(spark: SparkSession, dir: String): SparkSession = {
    Tables.names.foreach { n =>
      val df =
        if (n == "events") Tables.events(spark, dir)
        else Tables.load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
    CosineSimilarity.register(spark)
    DotProduct.register(spark)
    spark
  }

  /** Run SQL against the views registered by [[open]]. */
  def sql(spark: SparkSession, query: String): DataFrame = spark.sql(query)
}
