package graft

import org.apache.spark.sql.functions._

import graft.functions.CosineSimilarity
import graft.sim.Similarity

class CosineExpressionSpec extends SparkSpec {

  private lazy val emb = graft.tables.Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("native expression is bit-equal to the higher-order spelling") {
    val pairs = emb.limit(50).as("a").crossJoin(emb.limit(50).as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(
        Similarity.cosine(col("a.embedding").cast("array<double>"),
          col("b.embedding").cast("array<double>")).as("native"),
        Similarity.cosineHof(col("a.embedding").cast("array<double>"),
          col("b.embedding").cast("array<double>")).as("hof"))
    assert(pairs.filter(col("native") =!= col("hof")).count() === 0)
    assert(pairs.count() > 1000)
  }

  test("SQL registration: SELECT cosine_sim(...) works after register()") {
    CosineSimilarity.register(spark)
    emb.createOrReplaceTempView("emb_cos_test")
    val r = spark.sql(
      """SELECT cosine_sim(CAST(a.embedding AS ARRAY<DOUBLE>),
        |                  CAST(a.embedding AS ARRAY<DOUBLE>)) AS c
        |FROM emb_cos_test a LIMIT 5""".stripMargin).collect()
    r.foreach(row => assert(math.abs(row.getDouble(0) - 1.0) < 1e-12))
  }

  test("FuseCosine rewrites the 3-pass dot/norm spelling to the fused kernel") {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ graft.functions.FuseCosine
    try {
      val a = col("a.embedding"); val b = col("b.embedding")
      import graft.functions.DotProduct.dotProduct
      val threePass = dotProduct(a, b) /
        (sqrt(dotProduct(a, a)) * sqrt(dotProduct(b, b)))
      val q = emb.limit(10).as("a").crossJoin(emb.limit(10).as("b"))
        .select(threePass.as("c3"), Similarity.cosine(a, b).as("c1"))
      // the optimizer must have collapsed the Divide(dot, Multiply(..)) tree
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("dot_product"), optimized.take(500))
      assert(optimized.contains("cosine_sim"), optimized.take(500))
      // and the fused kernel is bit-equal to the spelling it replaced
      assert(q.filter(col("c3") =!= col("c1")).count() === 0)
    } finally spark.experimental.extraOptimizations = prev
  }

  test("GraftExtensions wires functions and the fusion rule") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext) // must register cleanly
  }

  test("expression participates in whole-stage codegen") {
    val q = emb.limit(20).as("a").crossJoin(emb.limit(20).as("b"))
      .select(Similarity.cosine(col("a.embedding"), col("b.embedding")).as("c"))
    q.collect() // finalize the AQE plan; codegen only shows in the final plan
    val plan = q.queryExecution.executedPlan.toString
    // the `*(n)` prefix marks a WholeStageCodegen stage in the plan string
    assert("""\*\(\d+\) Project \[cosine_sim""".r.findFirstIn(plan).isDefined,
      plan.take(800))
  }
}
