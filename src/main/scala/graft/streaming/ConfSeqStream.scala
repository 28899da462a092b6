package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.ConfSeq

/** Streaming anytime-valid confidence sequence — the stream-side twin of
  * the x335 conversion-rate monitor, and the one registry operator that
  * is INHERENTLY streaming: an anytime-valid band exists precisely so a
  * team can peek after every ingest window and stop at the first crossing
  * without inflating error. Batch x335 replays the sequence over history;
  * this twin maintains it live.
  *
  * State is per-day (events, purchases) partials — a commutative monoid
  * (any micro-batch split sums to the same daily counts) — written into
  * batch_id partitions with dynamic overwrite so an at-least-once
  * re-delivery REPLACES its contribution (the [[VolumeStream]] /
  * [[PeriodogramStream]] idempotency discipline). The report recomputes
  * the band from the |days|-row count table through the SHARED
  * [[graft.ops.ConfSeq]] core, so the streaming path inherits x335's
  * oracle-checked semantics verbatim. ConfSeqStreamSpec proves
  * stream == one-shot == registry x335.
  */
object ConfSeqStream {

  /** One micro-batch's contribution: per-day (n, k) partials. Null-ts
    * events are excluded (they have no day — same round-12 contract as
    * the batch x335). */
  def accumulateBatch(batch: DataFrame, stateDir: String,
      batchId: Long): Unit =
    batch.filter(col("ts").isNotNull)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"),
        sum((col("event_type") === "purchase").cast("long")).as("k"))
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(stateDir)

  /** Wire [[accumulateBatch]] into a foreachBatch sink over an events
    * stream carrying `ts` and `event_type` columns. */
  def bandOnIngest(stream: DataFrame, stateDir: String,
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, id: Long) =>
        accumulateBatch(b, stateDir, id)
      }
      .start()

  /** The current confidence sequence off the accumulated state — the
    * EXACT x335 output contract (day, t, n_events, rate, cs_lo, cs_hi,
    * excludes_half, excluded_half_ever). A monitor acts on the LAST row's
    * excluded_half_ever: with an anytime-valid band, stopping at the
    * first crossing is safe. */
  def report(spark: SparkSession, stateDir: String): DataFrame =
    ConfSeq.fromCounts(
      spark.read.parquet(stateDir)
        .groupBy("day")
        .agg(sum(col("n")).as("n"), sum(col("k")).as("k")))
}
