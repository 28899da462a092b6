package graft.streaming

import scala.util.chaining._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

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
  * [[PeriodogramStream]] idempotency discipline). Once the partition
  * count passes `compactAfter`, every batch EXCEPT the current one folds
  * into the consolidated partition (batch_id = -1) — safe because
  * foreachBatch can only re-deliver the most recent uncommitted batch, so
  * older partitions are immutable history; total state is then bounded at
  * ~2 × |day grid| rows regardless of how long the monitor runs
  * (round-12 ADVICE: it was O(batches × days) before). The report
  * recomputes the band from the |days|-row count table through the SHARED
  * [[graft.ops.ConfSeq]] core, so the streaming path inherits x335's
  * oracle-checked semantics verbatim. ConfSeqStreamSpec proves
  * stream == one-shot == registry x335, re-delivery idempotency, the
  * state bound across many batches, and the empty-state read.
  */
object ConfSeqStream {

  /** x335 count-table input schema — used to give a pre-first-commit
    * report the right (empty) shape instead of an AnalysisException. */
  private val countsSchema = StructType(Seq(
    StructField("day", DateType),
    StructField("n", LongType),
    StructField("k", LongType)))

  /** One micro-batch's contribution: per-day (n, k) partials. Null-ts
    * events are excluded (they have no day — same round-12 contract as
    * the batch x335). */
  def accumulateBatch(batch: DataFrame, stateDir: String,
      batchId: Long, compactAfter: Int = 12): Unit = {
    batch.filter(col("ts").isNotNull)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"),
        sum((col("event_type") === "purchase").cast("long")).as("k"))
      .pipe(StateCompaction.writeBatchPartition(_, stateDir, batchId))
    // day-keyed (n, k) sum-monoid fold through the shared crash-safe
    // swap (round-13 ADVICE: the old in-place full overwrite here could
    // lose the entire state to a crash mid-rewrite)
    StateCompaction.compactSums(batch.sparkSession, stateDir, batchId,
      compactAfter, Seq("day"), Seq("n", "k"))
  }

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
    * first crossing is safe. Polling BEFORE the first micro-batch commits
    * returns an empty band of the same shape (round-12 ADVICE: it used to
    * throw UNABLE_TO_INFER_SCHEMA on the empty state directory). */
  def report(spark: SparkSession, stateDir: String): DataFrame = {
    // existence probed through StateCompaction (Hadoop FS, heals any
    // interrupted compaction swap; the old java.nio Files.walk here also
    // leaked its directory stream — round-13 ADVICE)
    val counts =
      if (StateCompaction.hasState(spark, stateDir))
        StateCompaction.read(spark, stateDir)
          .groupBy("day")
          .agg(sum(col("n")).as("n"), sum(col("k")).as("k"))
      else
        spark.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](),
          countsSchema)
    ConfSeq.fromCounts(counts)
  }
}
