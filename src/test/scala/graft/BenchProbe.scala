package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for dev loops (not part of the driver contract). */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    try {
      val r = spark.sql(
        """WITH RECURSIVE t(n) AS (
          |  SELECT 1
          |  UNION ALL
          |  SELECT n + 1 FROM t WHERE n < 5
          |) SELECT sum(n) FROM t""".stripMargin).head.getLong(0)
      println(s"PROBE recursive-cte sum=$r")
    } catch { case e: Throwable => println(s"PROBE recursive-cte FAILED: ${e.getMessage.take(200)}") }
    try {
      val r = spark.sql(
        """WITH RECURSIVE t(n) AS (
          |  SELECT 1
          |  UNION
          |  SELECT CASE WHEN n >= 3 THEN 3 ELSE n + 1 END FROM t
          |) SELECT sum(n) FROM t""".stripMargin).head.getLong(0)
      println(s"PROBE recursive-cte-distinct sum=$r") // 1+2+3=6 iff UNION dedups
    } catch { case e: Throwable => println(s"PROBE recursive-cte-distinct FAILED: ${e.getMessage.take(200)}") }
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    li.count()
    for (_ <- 1 to 2) {
      time("coPurchasePairs-HOF") {
        graft.ops.Graph.coPurchasePairs(li, 2).count()
      }
      time("coPurchasePairs-selfjoin") {
        val p = li.select(col("l_orderkey").as("ok"), col("l_partkey"))
        p.as("a").join(p.as("b"),
            col("a.ok") === col("b.ok") && col("a.l_partkey") < col("b.l_partkey"))
          .groupBy(col("a.l_partkey").as("part_a"), col("b.l_partkey").as("part_b"))
          .agg(count(lit(1)).as("n_together"))
          .filter(col("n_together") >= 2)
          .count()
      }
    }
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    emb.count()
    // warm
    graft.sim.Similarity.pqBuild(emb, iters = 1).codes.count()
    val idx = time("pqBuild(iters=8)") { graft.sim.Similarity.pqBuild(emb) }
    time("codes.count") { idx.codes.count() }
    val idx2 = time("pqBuild(iters=2)") { graft.sim.Similarity.pqBuild(emb, iters = 2) }
    time("codes2.count") { idx2.codes.count() }
    time("pqTopK") {
      graft.sim.Similarity.pqTopK(idx, emb.filter(col("vec_id") < 20), 3).count()
    }
    time("pqTopK-again") {
      graft.sim.Similarity.pqTopK(idx, emb.filter(col("vec_id") < 20), 3).count()
    }
    val cached = idx.copy(codes = idx.codes.cache())
    cached.codes.count()
    time("pqTopK-cachedCodes") {
      graft.sim.Similarity.pqTopK(cached, emb.filter(col("vec_id") < 20), 3).count()
    }
    spark.stop()
  }
}
