package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.tables.{LakeTable, Tables}
import graft.text.{Dedup, TextStats}

/** Streaming corpus ingestion — the incremental form of the pre-training
  * data pipeline: new document files are quality-gated, exact-deduped
  * within the batch AND against everything already committed, then appended
  * to the lake as one commit per micro-batch.
  *
  * Scale design: the against-the-lake dedup is an anti-join on the 128-bit
  * exact key ONLY — the lake side projects (k1, k2) out of its parquet
  * (column-pruned scan, no text bytes move), and the incoming micro-batch
  * is small, so the anti-join broadcasts the batch keys. State never lives
  * in the streaming state store; the lake itself is the dedup index, which
  * survives restarts for free (checkpoint replays re-land only files the
  * sink has not committed).
  */
object CorpusIngest {

  /** File-source stream over a documents-schema parquet directory. */
  def readDocStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(Tables.schemas("documents")).parquet(dir)

  /** Quality gate — the shared [[TextStats.passesQualityGate]] predicate as
    * a pure map (no self-join, streaming-safe, stays inside whole-stage
    * codegen). */
  def qualityGate(docs: DataFrame): DataFrame =
    docs.filter(TextStats.passesQualityGate())

  /** Start the ingest: quality-gate, dedup (in-batch + against the lake),
    * append to `table`. Returns the started query. */
  def start(spark: SparkSession, dir: String, lake: LakeTable, table: String,
            trigger: Trigger = Trigger.AvailableNow(),
            checkpoint: Option[String] = None): StreamingQuery = {
    val w = readDocStream(spark, dir).writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val gated = qualityGate(batch.toDF())
        // in-batch exact dedup: keep min doc_id per normalized text
        val fresh = Dedup.dropExactDups(gated)
          .withColumn("dup_key", Dedup.exactKey(col("text")))
        val novel =
          if (lake.exists(table)) {
            val seen = lake.read(table).select(col("dup_key"))
            fresh.join(seen, Seq("dup_key"), "left_anti")
          } else fresh
        val mode = if (lake.exists(table)) "append" else "overwrite"
        lake.write(novel, table, mode): Unit
      }
      .trigger(trigger)
    // a checkpoint skips re-listing already-processed files; even WITHOUT
    // one, replays are idempotent because the lake's keys absorb them
    checkpoint.fold(w)(c => w.option("checkpointLocation", c)).start()
  }
}
