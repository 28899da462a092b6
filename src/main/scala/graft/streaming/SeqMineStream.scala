package graft.streaming

import scala.util.chaining._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming sequential-pattern state — the stream-side twin of the x159
  * PrefixSpan query, so the early-journey pattern mine runs ON the ingest
  * instead of a nightly batch.
  *
  * State is each micro-batch's per-user EARLIEST ≤8 events (user_id, ts,
  * event_id, event_type) — slim rows, bounded 8 per (user, batch). The
  * min-8-by-(ts, event_id) reduction is a commutative monoid (any batch
  * split merges to the same global first-8), and unlike the count-monoid
  * streams it is also IDEMPOTENT once the report dedups by (user_id,
  * event_id): re-delivery of any event, in any batch, cannot change the
  * first-8 set. Batch partials land in batch_id partitions with dynamic
  * overwrite (the [[VolumeStream]]/[[PmiStream]] discipline) so a
  * re-delivered batch REPLACES its contribution. The report recomputes
  * x159's exact output contract from the ≤8·|users| state table via
  * [[graft.ops.SeqMine.prefixSpan]]; the event stream itself is never
  * rescanned. SeqMineStreamSpec proves stream == one-shot == registry
  * x159.
  */
object SeqMineStream {

  /** One micro-batch's contribution: per-user earliest ≤8 events. */
  def accumulateBatch(batch: DataFrame, stateDir: String,
      batchId: Long, compactAfter: Int = 12): Unit = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"),
      col("event_id"))
    batch.select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 8).drop("rn")
      .pipe(StateCompaction.writeBatchPartition(_, stateDir, batchId))
    // prefix fold: an event globally among a user's first 8 ranks <= 8 in
    // every subset containing it, so re-applying the report's own
    // dedup + first-8 window to the folded history loses nothing the
    // report would keep — and bounds state at 8 rows per user
    StateCompaction.compactIfNeeded(batch.sparkSession, stateDir, batchId,
      compactAfter) { df =>
      df.dropDuplicates("user_id", "event_id")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 8).drop("rn")
    }
  }

  /** Wire [[accumulateBatch]] into a foreachBatch sink over an events
    * stream carrying (user_id, ts, event_id, event_type). */
  def seqMineOnIngest(stream: DataFrame, stateDir: String,
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, id: Long) =>
        accumulateBatch(b, stateDir, id)
      }
      .start()

  /** PrefixSpan report off the accumulated state — the EXACT x159 output
    * contract (pattern, level, support, support_frac). The global first-8
    * per user comes from one per-user window over the ≤8·|users|·|batches|
    * state rows; dedup by (user_id, event_id) first makes the result
    * invariant under ANY re-delivery, not just same-batch replays. */
  def report(spark: SparkSession, stateDir: String,
      minSupFrac: Double = 0.5, maxLen: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"),
      col("event_id"))
    val first8 = StateCompaction.read(spark, stateDir)
      .dropDuplicates("user_id", "event_id")
      .withColumn("rn0", row_number().over(w))
      .filter(col("rn0") <= 8)
    graft.ops.SeqMine.prefixSpan(first8, "user_id", "event_type",
      Seq(col("ts"), col("event_id")), minSupFrac, maxLen)
  }
}
