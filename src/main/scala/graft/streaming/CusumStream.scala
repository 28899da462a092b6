package graft.streaming

import scala.util.chaining._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.CusumChart

/** Streaming CUSUM control chart — the stream-side twin of the x227
  * sequential drift detector. CUSUM is THE stream-native statistic
  * (Page 1954 designed it for sequential observation; a CUSUM recomputed
  * nightly has already paid its average run length in detection delay),
  * so the alarm belongs on the ingest.
  *
  * State is per-day event-count partials (a commutative monoid — any
  * micro-batch split sums to the same daily counts), written into
  * batch_id partitions with dynamic overwrite so an at-least-once
  * re-delivery REPLACES its contribution (the
  * [[VolumeStream]]/[[EwmaStream]] idempotency discipline). The report
  * recomputes the trajectory from the |days|-row count table through the
  * SHARED [[graft.ops.CusumChart]] core — prefix-sum + running-min, not
  * a loop — so the streaming path inherits x227's oracle-checked
  * semantics verbatim. CusumStreamSpec proves stream == one-shot ==
  * registry x227.
  */
object CusumStream {

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
  def cusumOnIngest(stream: DataFrame, stateDir: String,
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, id: Long) =>
        accumulateBatch(b, stateDir, id)
      }
      .start()

  /** The current chart off the accumulated state — the EXACT x227
    * output contract (day, n, s_hi, s_lo, alarm). */
  def report(spark: SparkSession, stateDir: String): DataFrame =
    CusumChart.fromCounts(
      StateCompaction.read(spark, stateDir)
        .groupBy("day").agg(sum(col("n")).as("n")))
}
