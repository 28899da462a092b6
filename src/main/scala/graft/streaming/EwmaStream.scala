package graft.streaming

import scala.util.chaining._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.EwmaChart

/** Streaming EWMA control chart — the stream-side twin of the x236
  * small-shift monitor, so the λ = 0.2 drift alarm runs ON the ingest
  * instead of a nightly batch (monitoring is the stream-native workload:
  * an EWMA that is recomputed offline has already missed its shift).
  *
  * State is per-day event-count partials (a commutative monoid — any
  * micro-batch split sums to the same daily counts), written into
  * batch_id partitions with dynamic overwrite so an at-least-once
  * re-delivery REPLACES its contribution (the
  * [[VolumeStream]]/[[DecayStream]] idempotency discipline). The report
  * recomputes the chart from the |days|-row count table through the
  * SHARED [[graft.ops.EwmaChart]] core — the two-level rescaled scan
  * that makes the geometric recursion a bounded set computation — so the
  * streaming path inherits x236's oracle-checked semantics verbatim.
  * EwmaStreamSpec proves stream == one-shot == registry x236.
  */
object EwmaStream {

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
  def ewmaOnIngest(stream: DataFrame, stateDir: String,
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, id: Long) =>
        accumulateBatch(b, stateDir, id)
      }
      .start()

  /** The current chart off the accumulated state — the EXACT x236
    * output contract (day, n, ewma, control_limit, alarm). */
  def report(spark: SparkSession, stateDir: String): DataFrame =
    EwmaChart.fromCounts(
      StateCompaction.read(spark, stateDir)
        .groupBy("day").agg(sum(col("n")).as("n")))
}
