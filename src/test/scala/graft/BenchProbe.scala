package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for dev loops (not part of the driver contract). */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("PROBE_SHUFFLE", "32"))
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("PROBE_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    import graft.text.{Dedup, TextFeatures, TextStats}
    import graft.sim.Similarity
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    // q44 decomposition: recompute (shipped) vs persisting the exploded
    // token frame (the r12-rejected alternative) vs persisting at the
    // (doc, feat) tf grain. Three warm iterations each, q43-family warmup
    // first, min is what Bench would record.
    time("warmup q43-family") {
      Dedup.minhashNearDupsShingle(docs, 32, 16, 3, 0.8).count(): Unit
    }
    def q44(variant: String): Long = {
      val numFeatures = 256
      val emb = variant match {
        case "recompute" =>
          TextFeatures.tfidfEmbeddingsPortable(docs, numFeatures)
        case _ =>
          val tok = docs.select(col("doc_id"),
              explode(TextStats.tokens(TextStats.normalize(col("text")))).as("tok"))
            .select(col("doc_id"),
              pmod(Dedup.portableTokenHash(col("tok")), lit(numFeatures.toLong))
                .cast("int").as("feat"))
          val base = if (variant == "persist-tok") tok.persist()
            else tok
          val tf0 = base.groupBy("doc_id", "feat").agg(count(lit(1)).as("tf"))
          val tf = if (variant == "persist-tf") tf0.persist() else tf0
          val dft = (if (variant == "persist-tf") tf.select("doc_id", "feat")
            else base.distinct())
            .distinct().groupBy("feat").agg(count(lit(1)).as("df"))
          val m = docs.agg(count(lit(1)).as("m"))
          val idf = floor(log((col("m") + 1).cast("double") /
            (col("df") + 1).cast("double")) * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
          val w = tf.join(broadcast(dft), "feat").crossJoin(broadcast(m))
            .select(col("doc_id"), col("feat"),
              (col("tf").cast("double") * idf).as("w"))
          w.groupBy("doc_id")
            .agg(map_from_entries(collect_list(struct(col("feat"), col("w")))).as("mp"))
            .select(col("doc_id").as("vec_id"),
              transform(sequence(lit(0), lit(numFeatures - 1)),
                i => coalesce(element_at(col("mp"), i), lit(0.0))).as("embedding"))
      }
      val p = emb.persist()
      val n = Similarity.bruteForceTopK(p, p.filter(col("vec_id") < 200), 3).count()
      graft.ops.Caching.releaseAll(spark)
      n
    }
    for (variant <- Seq("recompute", "persist-tok", "persist-tf");
         it <- 1 to 3)
      time(s"q44/$variant#$it") { println("n=" + q44(variant)) }
    spark.stop()
  }
}
