package graft.streaming

import scala.util.chaining._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming trending state — the stream-side twin of the x175 half-life
  * decayed-popularity query, so the "what's hot NOW" ranking refreshes on
  * the ingest instead of a nightly batch. State is per-batch
  * (item, day, cnt) cell partials (a commutative monoid: any micro-batch
  * split sums to the same cells), written into batch_id partitions with
  * dynamic overwrite so an at-least-once re-delivery REPLACES its
  * contribution — the [[VolumeStream]]/[[DriftStream]] idempotency
  * discipline. The report re-scores through [[graft.ops.Decay]] — the
  * single shared scoring contract with the registry — against the
  * CURRENT newest day, which is the semantics a trending feed wants:
  * yesterday's burst decays as new days arrive, with no event rescans
  * and state bounded at |items|·|days| cells regardless of event volume.
  * DecayStreamSpec proves stream == one-shot == registry x175.
  */
object DecayStream {

  /** One micro-batch's contribution: (item, day) count cells. */
  def accumulateBatch(batch: DataFrame, stateDir: String,
      batchId: Long, compactAfter: Int = 12): Unit = {
    batch
      .select(expr("variant_get(parse_json(props), '$.k', 'int')").as("item"),
        to_date(col("ts")).as("day"))
      .filter(col("item").isNotNull)
      .groupBy("item", "day").agg(count(lit(1)).as("cnt"))
      .pipe(StateCompaction.writeBatchPartition(_, stateDir, batchId))
    StateCompaction.compactSums(batch.sparkSession, stateDir, batchId,
      compactAfter, Seq("item", "day"), Seq("cnt"))
  }

  /** Wire [[accumulateBatch]] into a foreachBatch sink over an events
    * stream carrying (ts, props). */
  def trendingOnIngest(stream: DataFrame, stateDir: String,
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, id: Long) =>
        accumulateBatch(b, stateDir, id)
      }
      .start()

  /** Trending report off the accumulated cells — the EXACT x175 output
    * contract via the shared [[graft.ops.Decay]] core (which re-sums the
    * batch partials to the (item, day) grain before scoring). */
  def report(spark: SparkSession, stateDir: String): DataFrame =
    graft.ops.Decay.decayedPopularity(
      StateCompaction.read(spark, stateDir).select("item", "day", "cnt"))
}
