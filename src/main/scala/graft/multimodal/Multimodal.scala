package graft.multimodal

import java.nio.ByteBuffer

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed partition-parallel with typed
  * `mapPartitions` (the Scala analogue of arrow-batched pandas UDFs — an
  * iterator of rows per partition, never a driver collect).
  *
  * The actual media codecs are STUBBED (no image/audio libraries exist in
  * this environment): `decode` parses a deterministic fake header that
  * [[encodeFake]] plants, and `extractFeatures` derives a deterministic
  * embedding from the payload hash. The Spark-side plumbing — schemas,
  * binary transport, batch iteration, partitioning — is real and tested;
  * swapping in a real codec is a body-swap of [[FakeCodec]].
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                            width: Int, height: Int, n_frames: Int)

  final case class DecodedFrame(media_id: Long, frame_idx: Int, width: Int,
                                height: Int, n_pixel_bytes: Long)

  final case class MediaFeature(media_id: Long, embedding: Array[Float])

  /** STUB codec: header = width(4B BE) | height(4B BE) | frames(4B BE), then
    * the payload. A real implementation would wrap an image/video library
    * here; everything outside this object is codec-agnostic. */
  private[multimodal] object FakeCodec {
    val HeaderLen = 12

    def encode(width: Int, height: Int, frames: Int, body: Array[Byte]): Array[Byte] = {
      val bb = ByteBuffer.allocate(HeaderLen + body.length)
      bb.putInt(width).putInt(height).putInt(frames).put(body)
      bb.array()
    }

    def decodeHeader(payload: Array[Byte]): (Int, Int, Int) = {
      val bb = ByteBuffer.wrap(payload)
      (bb.getInt, bb.getInt, bb.getInt)
    }
  }

  /** Deterministic fake media derived from the documents table (text becomes
    * the payload; dimensions derive from n_chars so oracles can recompute
    * them). Kind cycles image/audio/video by doc_id. */
  def syntheticMediaFromDocs(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text"), col("n_chars")).as[(Long, String, Long)]
      .map { case (id, text, nChars) =>
        val width = (16 + (nChars % 64) * 4).toInt
        val height = (16 + ((nChars * 7) % 48) * 4).toInt
        val frames = (1 + (id % 5)).toInt
        val kind = Seq("image", "audio", "video")((id % 3).toInt)
        MediaRow(id, kind, FakeCodec.encode(width, height, frames, text.getBytes("UTF-8")),
          width, height, frames)
      }
  }

  /** Decode pass: batch-iterate each partition, parse headers, emit one row
    * per frame (video) or one row (image/audio). Pure partition-local map —
    * no shuffle, scales with input splits. */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { m =>
        val (w, h, frames) = FakeCodec.decodeHeader(m.payload)
        val body = m.payload.length - FakeCodec.HeaderLen
        (0 until frames).iterator.map { f =>
          DecodedFrame(m.media_id, f, w, h, body.toLong)
        }
      }
    }
  }

  /** Frame sampling: keep every `everyN`-th frame (the video path's
    * cost-control knob before feature extraction). */
  def sampleFrames(frames: Dataset[DecodedFrame], everyN: Int): Dataset[DecodedFrame] =
    frames.filter(f => f.frame_idx % everyN == 0)

  /** STUB feature extraction: deterministic pseudo-embedding from the payload
    * hash (xorshift expansion). Real models slot in per partition — the
    * iterator shape batches naturally (load model once per partition). */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition setup happens once (model load in a real impl)
      rows.map { m =>
        var s = java.util.Arrays.hashCode(m.payload).toLong | 1L
        val emb = Array.fill(dim) {
          s ^= s >>> 12; s ^= s << 25; s ^= s >>> 27
          ((s * 0x2545F4914F6CDD1DL) >>> 40).toFloat / (1 << 24).toFloat
        }
        MediaFeature(m.media_id, emb)
      }
    }
  }

  /** Resize metadata transform (stub: halves dimensions, keeps payload). */
  def resize(media: Dataset[MediaRow], maxSide: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { m =>
      val scale = math.max(1, math.max(m.width, m.height) / maxSide)
      m.copy(width = m.width / scale, height = m.height / scale)
    }
  }

  /** End-to-end stats per media item (the oracle-checkable projection:
    * every value derives from doc_id/n_chars/text length alone). */
  def mediaStats(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val media = syntheticMediaFromDocs(docs)
    val frames = decode(media)
    frames.groupBy(col("media_id").as("doc_id"))
      .agg(
        max("width").as("width"), max("height").as("height"),
        count(lit(1)).cast("long").as("n_frames"),
        max("n_pixel_bytes").as("payload_bytes"))
  }
}
