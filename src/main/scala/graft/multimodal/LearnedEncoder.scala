package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Learned-embedding extractor STAND-IN — the last §8 slot, executed.
  *
  * No model weights exist in this environment (reference:
  * `scripts/validate_dataset.py` ships no model artifacts either), so a
  * real trained network cannot be pinned here. What CAN be built — and
  * what this object builds — is the full production serving
  * architecture around the weights, executed end-to-end rather than
  * documented at a seam:
  *
  *   train → persist a VERSIONED model artifact (lake tables: weights +
  *   meta) → driver-side load + validate → broadcast the packed blob →
  *   per-JVM model BUILD inside `mapPartitions` (the exact place an
  *   ONNX/torch session constructor goes — once per executor, not once
  *   per row) → batch encode.
  *
  * The stand-in weights are a SEEDED INTEGER random projection (the
  * classic Johnson–Lindenstrauss shape: out = W·x, W i.i.d.-ish from a
  * counter-based closed form) over the 88-dim classical image
  * descriptor. Because every weight is a closed-form integer and every
  * descriptor dim is an exact integer, every output coordinate replays
  * ARITHMETICALLY in SQL — the oracle checks the whole serving chain,
  * not a smoke signal. Swapping real weights in changes ONLY
  * [[weight]]/[[trainProjection]]; the artifact lifecycle, broadcast,
  * per-JVM cache, and batch-encode path are the production code.
  */
object LearnedEncoder {

  /** Packed model: row-major [out][in] integer weights. Small by
    * construction (a projection head, not a backbone); blob-sized for
    * broadcast. */
  final case class ProjectionModel(inDim: Int, outDim: Int, seed: Long,
                                   weights: Array[Long]) {
    require(weights.length == inDim * outDim,
      s"model blob carries ${weights.length} weights for a " +
        s"${outDim}x$inDim projection")
  }

  /** Closed-form stand-in weight in [-63, 63]: prime-modulus affine +
    * quadratic cross term (the fixture degeneracy rule — no two rows or
    * columns are affinely related), replayed verbatim by the oracle. */
  def weight(seed: Long, outIdx: Long, inIdx: Long): Long = {
    require(seed >= 0, "encoder seed must be non-negative")
    (seed * 31L + outIdx * 293L + inIdx * 181L + outIdx * inIdx * 97L) %
      127L - 63L
  }

  /** "Training": materialize the seeded projection as a weight frame
    * (dim_out, dim_in, w) — generated DISTRIBUTED via `spark.range`, the
    * same shape a real trainer's exported weight table lands in. */
  def trainProjection(spark: SparkSession, inDim: Int, outDim: Int,
                      seed: Long): DataFrame = {
    require(inDim > 0 && outDim > 0, "projection dims must be positive")
    val s = lit(seed)
    spark.range(inDim.toLong * outDim)
      .select((col("id") / inDim).cast("int").as("dim_out"),
        (col("id") % inDim).cast("int").as("dim_in"))
      .select(col("dim_out"), col("dim_in"),
        ((s * 31L + col("dim_out") * 293L + col("dim_in") * 181L +
          col("dim_out") * col("dim_in") * 97L) % 127L - 63L).as("w"))
  }

  /** Persist the model as a versioned lake artifact: weight table +
    * 1-row meta (dims, seed) — the [[graft.text.QualityClassifier]]
    * artifact lifecycle applied to an encoder. */
  def saveEncoder(lake: graft.tables.LakeTable, prefix: String,
                  weights: DataFrame, inDim: Int, outDim: Int,
                  seed: Long): Unit = {
    val spark = weights.sparkSession
    import spark.implicits._
    lake.write(weights, s"${prefix}_enc_weights", "overwrite"): Unit
    lake.write(Seq((inDim, outDim, seed)).toDF("in_dim", "out_dim", "seed"),
      s"${prefix}_enc_meta", "overwrite"): Unit
  }

  /** Load a persisted encoder into its packed serving form. The weight
    * collect is MODEL-sized (inDim·outDim rows — a projection head, KBs),
    * not data-sized: loading an artifact onto the driver before
    * broadcast is the canonical small-model serving shape. Missing
    * weights and dim mismatches fail by name. */
  def loadEncoder(lake: graft.tables.LakeTable,
                  prefix: String): ProjectionModel = {
    val meta = lake.read(s"${prefix}_enc_meta").head()
    val inDim = meta.getAs[Int]("in_dim")
    val outDim = meta.getAs[Int]("out_dim")
    val seed = meta.getAs[Long]("seed")
    val w = new Array[Long](inDim * outDim)
    java.util.Arrays.fill(w, Long.MinValue)
    lake.read(s"${prefix}_enc_weights")
      .select("dim_out", "dim_in", "w").collect().foreach { r =>
        val o = r.getInt(0); val i = r.getInt(1)
        require(o >= 0 && o < outDim && i >= 0 && i < inDim,
          s"encoder $prefix: weight ($o, $i) outside ${outDim}x$inDim")
        w(o * inDim + i) = r.getLong(2)
      }
    require(!w.contains(Long.MinValue),
      s"encoder $prefix: weight table is missing entries for the " +
        s"declared ${outDim}x$inDim projection")
    ProjectionModel(inDim, outDim, seed, w)
  }

  /** Per-JVM built-model cache — the executor-side singleton a real
    * model runtime (ONNX session, torch module) would live in. Keyed by
    * the model identity; built AT MOST ONCE per JVM per model, however
    * many partitions an executor runs. */
  private val builtModels =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Long]]()
  // exposed for the spec: proves the build ran once per JVM, not per row
  private[graft] val buildCount = new java.util.concurrent.atomic.AtomicLong(0)

  /** Serve: project every (vec_id, embedding[inDim]) to embedding[outDim]
    * under the loaded model — `mapPartitions` with the per-JVM model
    * build inside (THE model-load seam, executed). The blob travels by
    * broadcast; partitions share the built matrix through
    * [[builtModels]]. Output keeps the Similarity column contract
    * (vec_id, embedding), so projected vectors plug into the whole
    * search surface (brute/LSH/IVF/PQ, MMR, SemDeDup) unchanged. Every
    * arithmetic step is exact: integer weights × integer-valued
    * descriptor dims, summed in Double far below 2^53. */
  def encodeWithModel(model: ProjectionModel, desc: DataFrame): DataFrame = {
    val spark = desc.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(
      (model.inDim, model.outDim, model.seed, model.weights))
    val key = s"proj-${model.inDim}x${model.outDim}-seed${model.seed}"
    desc.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Double])]
      .mapPartitions { iter =>
        // once per JVM: a real runtime would deserialize weights into a
        // session here; the stand-in packs them into the dense matrix
        val w = builtModels.computeIfAbsent(key, _ => {
          buildCount.incrementAndGet(): Unit
          bc.value._4
        })
        val (inDim, outDim, _, _) = bc.value
        iter.map { case (id, x) =>
          require(x.length == inDim,
            s"vec $id: ${x.length}-dim input for a ${outDim}x$inDim model")
          val out = new Array[Double](outDim)
          var o = 0
          while (o < outDim) {
            var acc = 0.0
            var i = 0
            while (i < inDim) { acc += w(o * inDim + i) * x(i); i += 1 }
            out(o) = acc
            o += 1
          }
          (id, out)
        }
      }
      .toDF("vec_id", "embedding")
  }
}
