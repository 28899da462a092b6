package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.DailySeries

/** Streaming monitoring suite over ONE shared day-count state: the
  * [[VolumeStream]] per-day monoid partials (batch_id-partitioned,
  * dynamic-overwrite idempotent) already feed the x95 CUSUM report; this
  * object adds the x143 change-point and x146 MASE reads off the SAME
  * state, so one ingest feed powers the whole day-series monitoring
  * stack (alarm → when-did-it-shift → is-the-forecast-still-honest)
  * without ever rescanning the event stream. Both reports fold the
  * shared [[graft.ops.DailySeries]] expressions, so the streaming path
  * inherits the oracle-checked x143/x146 semantics verbatim
  * (MonitorStreamSpec proves stream == registry exactly).
  */
object MonitorStream {

  /** The |days|-row daily table off the accumulated state (merging
    * micro-batch partials — the only streaming-specific step). Read
    * through [[StateCompaction]] so a poll mid-crash-recovery heals the
    * writer's interrupted compaction swap, like every sibling report. */
  private def daily(spark: SparkSession, stateDir: String): DataFrame =
    StateCompaction.read(spark, stateDir)
      .groupBy("day").agg(sum(col("n")).as("n"))

  /** x143 contract off the state: binary-segmentation first split. */
  def reportChangepoint(spark: SparkSession, stateDir: String): DataFrame =
    DailySeries.changepoint(daily(spark, stateDir))

  /** x146 contract off the state: seasonal-naive MASE eval. */
  def reportMase(spark: SparkSession, stateDir: String): DataFrame =
    DailySeries.maseForecast(daily(spark, stateDir).localCheckpoint())
}
