package graft

import org.apache.spark.sql.functions._

import graft.text.Dedup

/** Round-11 text operators: near-dup explanations. */
class Round11OpsSpec extends SparkSpec {

  test("explainNearDups ranks the rarest shared evidence first and is " +
    "capped per pair") {
    import spark.implicits._
    // every doc carries the same boilerplate tail (high df); docs 1 and 2
    // additionally share a rare verbatim passage (df 2)
    val boiler = "subscribe to our newsletter for updates"
    val rare = "the amethyst heron crossed the frozen canal"
    val docs = Seq(
      (1L, s"$rare and then $boiler"),
      (2L, s"$rare but later $boiler"),
      (3L, s"completely different words entirely here $boiler"),
      (4L, s"another unrelated document body text $boiler"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val got = Dedup.explainNearDups(docs, pairs, topK = 3)
      .orderBy("rn").collect()
      .map(r => (r.getString(2), r.getLong(3), r.getInt(4)))
    assert(got.length === 3) // capped at topK despite more shared grams
    // rank 1 must be a df-2 gram from the rare passage, not boilerplate
    assert(got.head._2 === 2L, s"rank-1 evidence not rare: $got")
    assert(rare.contains(got.head._1.split(" ").head),
      s"rank-1 gram ${got.head._1} not from the rare passage")
    // ranks ascend by df then gram (deterministic)
    assert(got.map(_._3).toSeq === Seq(1, 2, 3))
    assert(got.sliding(2).forall(w =>
      w(0)._2 < w(1)._2 || (w(0)._2 == w(1)._2 && w(0)._1 < w(1)._1)))
  }
}
