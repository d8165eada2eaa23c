package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  private lazy val docs = graft.tables.Tables.documents(spark, "/root/testdata/sf0.001")
  private lazy val media = Multimodal.syntheticMediaFromDocs(docs)

  test("decode recovers the encoded header for every media item") {
    val frames = Multimodal.decode(media)
    val bad = frames.toDF().as("f")
      .join(media.toDF().as("m"), col("f.media_id") === col("m.media_id"))
      .filter(col("f.width") =!= col("m.width") || col("f.height") =!= col("m.height"))
    assert(bad.count() === 0)
  }

  test("video frame fan-out matches declared frame count; sampling keeps every Nth") {
    val frames = Multimodal.decode(media)
    val perMedia = frames.groupBy("media_id").count()
      .join(media.toDF(), Seq("media_id"))
      .filter(col("count") =!= col("n_frames"))
    assert(perMedia.count() === 0)
    val sampled = Multimodal.sampleFrames(frames, 2)
    val expect = media.toDF().select(
      sum(ceil(col("n_frames") / 2.0))).collect()(0).getLong(0)
    assert(sampled.count() === expect)
  }

  test("feature extraction is deterministic with the declared dimension") {
    val f1 = Multimodal.extractFeatures(media, dim = 16).collect()
      .map(f => f.media_id -> f.embedding.toSeq).toMap
    val f2 = Multimodal.extractFeatures(media, dim = 16).collect()
      .map(f => f.media_id -> f.embedding.toSeq).toMap
    assert(f1 === f2)
    assert(f1.values.forall(_.size == 16))
  }

  test("resize bounds the longest side while keeping aspect scale") {
    val resized = Multimodal.resize(media, maxSide = 32).collect()
    assert(resized.forall(m => m.width <= 272 && m.height <= 208))
    val orig = media.collect().map(m => m.media_id -> m).toMap
    resized.foreach { m =>
      val o = orig(m.media_id)
      val scale = math.max(1, math.max(o.width, o.height) / 32)
      assert(m.width === o.width / scale)
    }
  }

  test("mediaStats is derivable from doc columns alone (oracle contract)") {
    val stats = Multimodal.mediaStats(spark, docs)
    val joined = stats.join(docs, Seq("doc_id"))
      .filter(col("width") =!= lit(16) + (col("n_chars") % 64) * 4 ||
        col("n_frames") =!= lit(1) + (col("doc_id") % 5))
    assert(joined.count() === 0)
  }
}
