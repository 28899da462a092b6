package graft.streaming

import scala.util.chaining._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming active-user state — the stream-side twin of the x163 rolling
  * WAU/stickiness query, so growth accounting runs ON the ingest instead
  * of a nightly batch. State is per-batch DISTINCT (user_id, day) pairs —
  * a set-union monoid, IDEMPOTENT after the report's dedup (re-delivery
  * of any event, in any batch, cannot change the active-day set — the
  * same stronger-than-count guarantee as [[SeqMineStream]]). Batch
  * partials land in batch_id partitions with dynamic overwrite (the
  * [[VolumeStream]] discipline). The report recomputes x163's exact
  * output contract from the |users|·|days|-bounded state; the event
  * stream itself is never rescanned. WauStreamSpec proves stream ==
  * one-shot == registry x163.
  */
object WauStream {

  /** One micro-batch's contribution: distinct (user, day). */
  def accumulateBatch(batch: DataFrame, stateDir: String,
      batchId: Long, compactAfter: Int = 12): Unit = {
    batch.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .pipe(StateCompaction.writeBatchPartition(_, stateDir, batchId))
    // roster fold: the report distincts (user_id, day) anyway, so the
    // consolidated partition keeps one row per active (user, day) cell
    StateCompaction.compactDistinct(batch.sparkSession, stateDir, batchId,
      compactAfter)
  }

  /** Wire [[accumulateBatch]] into a foreachBatch sink over an events
    * stream carrying (user_id, ts). */
  def wauOnIngest(stream: DataFrame, stateDir: String,
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, id: Long) =>
        accumulateBatch(b, stateDir, id)
      }
      .start()

  /** Rolling-WAU report off the accumulated state — the EXACT x163
    * output contract (day, dau, wau, stickiness), via the single shared
    * definition in [[graft.ops.Wau]]. */
  def report(spark: SparkSession, stateDir: String): DataFrame =
    graft.ops.Wau.rollingReport(
      StateCompaction.read(spark, stateDir)
        .select(col("user_id"), col("day")).distinct())
}
