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

  test("audioBoilerplatePrints surfaces exactly the shared jingle, " +
    "volume-scaled stamps included; per-clip bodies never recur") {
    import graft.multimodal.MediaDedup
    import graft.multimodal.Multimodal.{Containers, MediaRow}
    import spark.implicits._
    def clip(id: Long, f: Int => Int): MediaRow = {
      val n = 700
      val body = new Array[Byte](n * 2)
      var p = 0
      while (p < n) {
        val s = f(p)
        body(2 * p) = (s & 0xFF).toByte
        body(2 * p + 1) = ((s >> 8) & 0xFF).toByte
        p += 1
      }
      MediaRow(id, "audio", Containers.wav(1, 16000, body), 0, 0, 1)
    }
    def jingle(p: Int): Int = (((p * p * 5 + p * 3) % 4001) - 2000)
    def bodyF(id: Long)(p: Int): Int =
      ((p.toLong * p * (7 + id) + p * (11 + id)) % 4096).toInt - 2048
    val media = (
      // 4 stamped clips, one at DOUBLE volume (contour-invariant)
      (1L to 4L).map(id => clip(id, p =>
        if (p < 570) jingle(p) * (if (id == 4L) 2 else 1)
        else bodyF(id)(p))) ++
      (5L to 9L).map(id => clip(id, bodyF(id)))).toDS()
    val got = MediaDedup.audioBoilerplatePrints(media, minClips = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length === 1, s"expected one intro print, got ${got.toSeq}")
    assert(got.head._2 === 4L) // all four stamps, the scaled one included
  }
}
