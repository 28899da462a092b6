package graft.streaming

import scala.util.chaining._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming embedding-drift accumulator — the stream-side twin of the
  * registry's x87 drift detector, watching an embedding INGEST for
  * distribution shift while it happens (the input-side signal that feeds
  * the [[graft.ops.IvfPqIndex.retrainIfUnhealthy]] decision before x76's
  * occupancy ever skews).
  *
  * State is per-dim (count, sum) partials — a commutative monoid, so the
  * fold is order- and batching-free: any micro-batch split of the same
  * rows sums to the same state (DriftStreamSpec proves stream == one-shot
  * == registry x87). Partials are written into a `batch_id` partition
  * with dynamic overwrite, so a re-delivered micro-batch REPLACES its own
  * partition instead of double-counting — the idempotent-sink discipline
  * that foreachBatch's at-least-once contract requires. At 100 TB the
  * state is |batches|·|dims| rows of three numbers; the report never
  * rereads the corpus.
  */
object DriftStream {

  /** One micro-batch's contribution to the drift state. */
  def accumulateBatch(batch: DataFrame, embCol: String, stateDir: String,
      batchId: Long, compactAfter: Int = 12): Unit = {
    batch.select(posexplode(col(embCol)).as(Seq("pos", "x")))
      .groupBy((col("pos") + 1).cast("long").as("dim"))
      .agg(count(lit(1)).as("n"), sum(col("x").cast("double")).as("s"))
      .pipe(StateCompaction.writeBatchPartition(_, stateDir, batchId))
    StateCompaction.compactSums(batch.sparkSession, stateDir, batchId,
      compactAfter, Seq("dim"), Seq("n", "s"))
  }

  /** Wire [[accumulateBatch]] into a foreachBatch sink over an embedding
    * stream. */
  def driftOnIngest(stream: DataFrame, embCol: String, stateDir: String,
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, id: Long) =>
        accumulateBatch(b, embCol, stateDir, id)
      }
      .start()

  /** Drift report off the accumulated state vs a reference corpus — the
    * SAME output contract as registry query x87 (metric/dim/value rows:
    * mean_cos, delta_l2, top-10 abs_delta dims), so the streaming path
    * inherits the oracle-checked semantics. Ingest means come from the
    * summed partials (sum/count per dim — 64 groups regardless of how
    * much has streamed); the reference mean is one aggregate over the
    * standing corpus. */
  def report(spark: SparkSession, stateDir: String, reference: DataFrame,
      embCol: String): DataFrame = {
    val cur = StateCompaction.read(spark, stateDir)
      .groupBy("dim")
      .agg(round(sum(col("s")) / sum(col("n")), 6).as("m1"))
    val ref = reference
      .select(posexplode(col(embCol)).as(Seq("pos", "x")))
      .groupBy((col("pos") + 1).cast("long").as("dim"))
      .agg(round(avg(col("x").cast("double")), 6).as("m0"))
    val delta = ref.join(cur, "dim")
      .select(col("dim"), col("m0"), col("m1"),
        round(abs(col("m1") - col("m0")), 6).as("ad"))
    val top10 = delta.orderBy(col("ad").desc, col("dim")).limit(10)
      .select(lit("abs_delta").as("metric"), col("dim"),
        col("ad").as("value"))
    val summary = delta.agg(
        round(sum(col("m0") * col("m1")) /
          (sqrt(sum(col("m0") * col("m0"))) *
            sqrt(sum(col("m1") * col("m1")))), 6).as("mean_cos"),
        round(sqrt(sum(pow(col("m1") - col("m0"), lit(2)))), 6)
          .as("delta_l2"))
    val cosRow = summary.select(lit("mean_cos").as("metric"),
      lit(-1L).as("dim"), col("mean_cos").as("value"))
    val l2Row = summary.select(lit("delta_l2").as("metric"),
      lit(-1L).as("dim"), col("delta_l2").as("value"))
    cosRow.union(l2Row).union(top10).orderBy("metric", "dim")
  }
}
