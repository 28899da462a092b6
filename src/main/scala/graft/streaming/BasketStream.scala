package graft.streaming

import scala.util.chaining._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming basket state — the stream-side twin of the x162
  * association-rules query, so co-purchase rules refresh ON the ingest
  * instead of a nightly batch. State is per-batch DISTINCT (user_id,
  * day, item) triples — a set-union monoid, IDEMPOTENT after the
  * report's dedup (the [[WauStream]]/[[SeqMineStream]] guarantee class:
  * re-delivery of any event, in any batch, cannot change the basket
  * set). Batch partials land in batch_id partitions with dynamic
  * overwrite. The report recomputes x162's exact output contract from
  * the basket state via [[graft.ops.AssocRules]] — the single shared
  * rule algebra; the event stream itself is never rescanned.
  * BasketStreamSpec proves stream == one-shot == registry x162.
  */
object BasketStream {

  /** One micro-batch's contribution: distinct item-bearing baskets. */
  def accumulateBatch(batch: DataFrame, stateDir: String,
      batchId: Long, compactAfter: Int = 12): Unit = {
    batch
      .select(col("user_id"), to_date(col("ts")).as("day"),
        expr("variant_get(parse_json(props), '$.k', 'int')").as("item"))
      .filter(col("item").isNotNull).distinct()
      .pipe(StateCompaction.writeBatchPartition(_, stateDir, batchId))
    // roster fold: the report distincts (user_id, day, item) anyway, so
    // the consolidated partition keeps one row per basket cell
    StateCompaction.compactDistinct(batch.sparkSession, stateDir, batchId,
      compactAfter)
  }

  /** Wire [[accumulateBatch]] into a foreachBatch sink over an events
    * stream carrying (user_id, ts, props). */
  def basketsOnIngest(stream: DataFrame, stateDir: String,
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, id: Long) =>
        accumulateBatch(b, stateDir, id)
      }
      .start()

  /** Association-rules report off the accumulated state — the EXACT
    * x162 output contract. */
  def report(spark: SparkSession, stateDir: String,
      minSup: Int = 3): DataFrame =
    graft.ops.AssocRules.rules(
      StateCompaction.read(spark, stateDir)
        .select(col("user_id"), col("day"), col("item")).distinct()
        .localCheckpoint(),
      minSup)
}
