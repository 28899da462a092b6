package graft.streaming

import scala.util.chaining._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming Holt forecast — the stream-side twin of the x122 level+trend
  * query, so the per-type volume forecast updates ON the ingest instead
  * of a nightly batch. Same design as [[VolumeStream]]: state is
  * per-(event_type, day) count partials (a commutative monoid — any
  * micro-batch split sums to the same series), written into batch_id
  * partitions with dynamic overwrite so an at-least-once re-delivery
  * REPLACES its contribution. The report folds the Holt recurrence over
  * the aggregate-bounded series via [[graft.ops.Forecast.holt]] — the
  * EXACT x122 code path, so the streaming output inherits the
  * oracle-checked semantics; the event stream itself is never rescanned.
  * HoltStreamSpec proves stream == one-shot == registry x122.
  */
object HoltStream {

  /** One micro-batch's contribution: per-(type, day) counts. */
  def accumulateBatch(batch: DataFrame, stateDir: String,
      batchId: Long, compactAfter: Int = 12): Unit = {
    batch.groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .pipe(StateCompaction.writeBatchPartition(_, stateDir, batchId))
    StateCompaction.compactSums(batch.sparkSession, stateDir, batchId,
      compactAfter, Seq("event_type", "day"), Seq("n"))
  }

  /** Wire [[accumulateBatch]] into a foreachBatch sink over an events
    * stream carrying `event_type` and `ts` columns. */
  def holtOnIngest(stream: DataFrame, stateDir: String,
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, id: Long) =>
        accumulateBatch(b, stateDir, id)
      }
      .start()

  /** Holt report off the accumulated state — the exact x122 output
    * contract (event_type, n_days, level, trend, forecast, sse). */
  def report(spark: SparkSession, stateDir: String): DataFrame = {
    val daily = StateCompaction.read(spark, stateDir)
      .groupBy("event_type", "day").agg(sum(col("n")).as("y"))
    graft.ops.Forecast.holt(daily, "event_type").orderBy("event_type")
  }
}
