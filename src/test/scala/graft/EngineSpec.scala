package graft

/** The one-call SQL facade: views under reference names + custom functions
  * on a live session. */
class EngineSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("open registers every table as a view; plain SQL joins just work") {
    Engine.open(spark, d)
    val r = Engine.sql(spark,
      """SELECT c_mktsegment, count(*) AS n
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin).collect()
    assert(r.length === 5)
    assert(r.map(_.getLong(1)).sum === 1500L)
    // events view gets the ns->us timestamp normalization, same as Tables
    val ts = Engine.sql(spark,
      "SELECT count(*) FROM events WHERE ts IS NOT NULL").head.getLong(0)
    assert(ts > 0)
  }

  test("custom SQL functions are installed on the live session") {
    Engine.open(spark, d)
    // the expressions contract is array<double> (codegen kernel); the float
    // embeddings cast at the call site, same as the q28 DataFrame path
    val sim = Engine.sql(spark,
      """SELECT a.vec_id, b.vec_id,
        |  cosine_sim(CAST(a.embedding AS ARRAY<DOUBLE>),
        |             CAST(b.embedding AS ARRAY<DOUBLE>)) AS s,
        |  dot_product(CAST(a.embedding AS ARRAY<DOUBLE>),
        |              CAST(a.embedding AS ARRAY<DOUBLE>)) AS selfdot
        |FROM embeddings a JOIN embeddings b ON a.vec_id = 0 AND b.vec_id = 1
        |""".stripMargin).head
    assert(sim.getDouble(2) >= -1.0001 && sim.getDouble(2) <= 1.0001)
    assert(sim.getDouble(3) > 0.0)
    // self-similarity is exactly 1 up to float rounding
    val self = Engine.sql(spark,
      """SELECT cosine_sim(CAST(embedding AS ARRAY<DOUBLE>),
        |                  CAST(embedding AS ARRAY<DOUBLE>))
        |FROM embeddings WHERE vec_id = 0""".stripMargin)
      .head.getDouble(0)
    assert(math.abs(self - 1.0) < 1e-6)
  }
}
