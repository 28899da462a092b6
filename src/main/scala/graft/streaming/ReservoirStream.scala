package graft.streaming

import scala.util.chaining._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Reservoir

/** Streaming per-stratum weighted reservoir — the stream-side twin of the
  * x221 A-ES draw, so a fixed-size weighted training subset stays current
  * as documents arrive instead of being redrawn from scratch each night.
  *
  * Why this is exact, not approximate: the A-ES key is a deterministic
  * function of (doc_id, n_chars), and top-k is a monoid homomorphism —
  * top-k(A ∪ B) = top-k(top-k(A) ∪ top-k(B)). So per-micro-batch state is
  * just each batch's k survivors per stratum (bounded at k·|strata| rows
  * per batch REGARDLESS of batch size), written into batch_id partitions
  * with dynamic overwrite so an at-least-once re-delivery REPLACES its
  * contribution (the VolumeStream/DecayStream idempotency discipline);
  * duplicate doc_ids across re-deliveries collapse at report time because
  * equal docs carry equal keys (dropDuplicates before the final rank).
  * The report re-ranks the union of survivors through the SAME
  * [[graft.ops.Reservoir]] core the registry query uses —
  * ReservoirStreamSpec proves stream == one-shot == registry x221.
  */
object ReservoirStream {

  val K = 10

  /** One micro-batch's contribution: its own k survivors per stratum. */
  def accumulateBatch(batch: DataFrame, stateDir: String,
      batchId: Long, compactAfter: Int = 12): Unit = {
    Reservoir.topKPerStratum(Reservoir.aesKeyed(batch), K)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .pipe(StateCompaction.writeBatchPartition(_, stateDir, batchId))
    // re-rank fold: keys are a deterministic function of doc_id, so the
    // global top-K per stratum is contained in the top-K of any subset
    // that covers it — folding history through the SAME topKPerStratum
    // keeps the report identical while bounding state at K rows per
    // stratum (plus the current batch's partition). Dedup FIRST
    // (round-14 ADVICE): a doc re-ingested in two folded batches carries
    // identical (source, doc_id) and would occupy two of the K
    // row_number slots, evicting the K-th DISTINCT doc from the
    // consolidated partition — the report dedups before ranking, so the
    // fold must too or it stops being report-preserving.
    StateCompaction.compactIfNeeded(batch.sparkSession, stateDir, batchId,
      compactAfter) { df =>
      Reservoir.topKPerStratum(
          Reservoir.aesKeyed(df.dropDuplicates("source", "doc_id")), K)
        .select(col("doc_id"), col("source"), col("n_chars"))
    }
  }

  /** Wire [[accumulateBatch]] into a foreachBatch sink over a document
    * stream carrying (doc_id, source, n_chars). */
  def reservoirOnIngest(stream: DataFrame, stateDir: String,
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, id: Long) =>
        accumulateBatch(b, stateDir, id)
      }
      .start()

  /** The current draw: re-rank the union of per-batch survivors through
    * the shared core — the EXACT x221 output contract. */
  def report(spark: SparkSession, stateDir: String): DataFrame =
    Reservoir.sample(
      StateCompaction.read(spark, stateDir)
        .select("doc_id", "source", "n_chars")
        .dropDuplicates("source", "doc_id"), K)
}
