package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.TextStats

object Probe7 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.tables.Tables.load(spark, "/root/testdata/sf0.1", "documents")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    // decontam spelling: explode inline right after projecting toks
    val a = docs.select(col("doc_id"), TextStats.tokens(TextStats.normalize(col("text"))).as("toks"))
      .select(col("doc_id"), explode(array_distinct(TextStats.shinglesOf(col("toks"), 3))).as("g"))
      .select(col("doc_id"), xxhash64(col("g")).as("g"))
    time("inline.1")(a.count()); time("inline.2")(a.count())
    // via shingleSets
    val b = graft.text.Dedup.shingleSets(docs, 3)
      .select(col("doc_id"), explode(col("s")).as("g"))
      .select(col("doc_id"), xxhash64(col("g")).as("g"))
    time("via-sets.1")(b.count()); time("via-sets.2")(b.count())
    println(b.queryExecution.executedPlan.toString.take(1500))
    spark.stop()
  }
}
