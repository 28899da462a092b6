package graft.streaming

import scala.util.chaining._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Periodogram

/** Streaming periodogram — the stream-side twin of the x308 seasonality
  * detector: the power spectrum a volume monitor wants to re-read after
  * every ingest window ("did a weekly cycle emerge?") without rescanning
  * the event history.
  *
  * State is per-day event-count partials (a commutative monoid — any
  * micro-batch split sums to the same daily counts), written into
  * batch_id partitions with dynamic overwrite so an at-least-once
  * re-delivery REPLACES its contribution (the
  * [[VolumeStream]]/[[CusumStream]] idempotency discipline). The report
  * recomputes the spectrum from the |days|-row count table through the
  * SHARED [[graft.ops.Periodogram]] core, so the streaming path inherits
  * x308's oracle-checked semantics verbatim. PeriodogramStreamSpec
  * proves stream == one-shot == registry x308.
  */
object PeriodogramStream {

  /** One micro-batch's contribution: per-day counts. */
  def accumulateBatch(batch: DataFrame, stateDir: String,
      batchId: Long, compactAfter: Int = 12): Unit = {
    batch.groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .pipe(StateCompaction.writeBatchPartition(_, stateDir, batchId))
    StateCompaction.compactSums(batch.sparkSession, stateDir, batchId,
      compactAfter, Seq("day"), Seq("n"))
  }

  /** Wire [[accumulateBatch]] into a foreachBatch sink over an events
    * stream carrying a `ts` column. */
  def spectrumOnIngest(stream: DataFrame, stateDir: String,
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, id: Long) =>
        accumulateBatch(b, stateDir, id)
      }
      .start()

  /** The current spectrum off the accumulated state — the EXACT x308
    * output contract (period, n_days, power, rel_power). */
  def report(spark: SparkSession, stateDir: String): DataFrame =
    Periodogram.fromCounts(
      StateCompaction.read(spark, stateDir)
        .groupBy("day").agg(sum(col("n")).as("n")))
}
