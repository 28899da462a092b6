package graft.streaming

import scala.util.chaining._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Incremental co-occurrence ingest — the stream-side twin of the x85
  * item-PMI query. Co-occurrence counts are pair-wise, so naive
  * recomputation is quadratic in context size on EVERY batch; the
  * incremental identity is the same one dedupe-on-ingest uses: when a
  * batch contributes new (context, item) rows, the only NEW pairs are
  * (new × already-seen-in-that-context) plus (new × new within the
  * batch) — existing×existing pairs were already counted. Both sides of
  * that join are keyed on the context, so per-batch cost follows the
  * batch's context occupancy, never the accumulated corpus.
  *
  * State layout under `stateDir` (both batch_id-partitioned, written
  * with dynamic partition overwrite so an at-least-once re-delivery
  * REPLACES its own contribution instead of double-counting — the
  * [[DriftStream]] idempotency discipline):
  *  - `items/`: the distinct (user_id, day, item) rows each batch added;
  *  - `pairs/`: that batch's pair-count increments (a commutative
  *    monoid — the report sums them in any order).
  * A batch's own prior partitions are EXCLUDED when computing "already
  * seen", so re-running batch N against state that already contains
  * batch N is deterministic and idempotent (PmiStreamSpec proves it).
  */
object PmiStream {

  /** (user, day, item) context rows of a raw events batch — must match
    * the x85 registry query's context definition exactly. */
  private def ctxItems(batch: DataFrame): DataFrame =
    batch.select(col("user_id"), to_date(col("ts")).as("day"),
      expr("variant_get(parse_json(props), '$.k', 'int')").as("item"))
      .distinct()

  /** One micro-batch's contribution to items + pair-count state. Past
    * `compactAfter` partitions each sub-state folds into its consolidated
    * partition: pair counts are a sum monoid (groupBy + sum), item rows
    * are globally distinct by construction (the left_anti gate admits a
    * context row exactly once), so an identity re-tag keeps the "already
    * seen" set byte-identical while bounding the PARTITION count a
    * long-lived monitor's every ingest must list and union. Re-delivery
    * stays safe: only the current batch can replay, and its partitions
    * are never folded. */
  def ingestBatch(batch: DataFrame, stateDir: String, batchId: Long,
      compactAfter: Int = 12): Unit = {
    val spark = batch.sparkSession
    val b = ctxItems(batch)
    val itemsPath = s"$stateDir/items"
    // hasState resolves through the session's Hadoop FileSystem (not
    // java.io.File — stateDir may be an HDFS/S3 URI at scale) and heals
    // any interrupted compaction swap BEFORE probing, so neither a remote
    // state dir nor a crash between the swap's two renames can read as
    // "no prior state" (which would double-count every pair on restart)
    val existing =
      if (StateCompaction.hasState(spark, itemsPath))
        StateCompaction.read(spark, itemsPath)
          .filter(col("batch_id") =!= batchId)
          .select("user_id", "day", "item")
      else b.limit(0)
    val newRows = b.join(existing, Seq("user_id", "day", "item"), "left_anti")
    val crossPairs = newRows.as("n").join(existing.as("o"),
        col("n.user_id") === col("o.user_id") &&
          col("n.day") === col("o.day") && col("n.item") =!= col("o.item"))
      .select(least(col("n.item"), col("o.item")).as("item_a"),
        greatest(col("n.item"), col("o.item")).as("item_b"))
    val newPairs = newRows.as("a").join(newRows.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.day") === col("b.day") && col("a.item") < col("b.item"))
      .select(col("a.item").as("item_a"), col("b.item").as("item_b"))
    crossPairs.union(newPairs)
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("n"))
      .pipe(StateCompaction.writeBatchPartition(_, s"$stateDir/pairs", batchId))
    newRows.pipe(StateCompaction.writeBatchPartition(_, itemsPath, batchId))
    StateCompaction.compactSums(spark, s"$stateDir/pairs", batchId,
      compactAfter, Seq("item_a", "item_b"), Seq("n"))
    StateCompaction.compactIfNeeded(spark, itemsPath, batchId,
      compactAfter)(identity)
  }

  /** Wire [[ingestBatch]] into a foreachBatch sink over an events stream
    * carrying (user_id, ts, props). */
  def pmiOnIngest(stream: DataFrame, stateDir: String,
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, id: Long) =>
        ingestBatch(b, stateDir, id)
      }
      .start()

  /** PMI report off the accumulated state — the EXACT x85 output contract
    * (top-50 pairs with counts and 6-decimal PMI), so the incremental
    * path inherits the oracle-checked semantics. Reads only state: the
    * events corpus is never rescanned. */
  def report(spark: SparkSession, stateDir: String): DataFrame = {
    val items = StateCompaction.read(spark, s"$stateDir/items")
      .select("user_id", "day", "item")
    val nCtx = items.select("user_id", "day").distinct()
      .agg(count(lit(1)).as("n_ctx"))
    val ic = items.groupBy(col("item")).agg(count(lit(1)).as("n_i"))
    val pairs = StateCompaction.read(spark, s"$stateDir/pairs")
      .groupBy("item_a", "item_b").agg(sum(col("n")).as("n_ab"))
      .filter(col("n_ab") >= 3)
    pairs
      .join(ic.select(col("item").as("item_a"), col("n_i").as("n_a")),
        "item_a")
      .join(ic.select(col("item").as("item_b"), col("n_i").as("n_b")),
        "item_b")
      .crossJoin(broadcast(nCtx))
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"),
        col("n_b"),
        round(log(col("n_ab").cast("double") * col("n_ctx") /
          (col("n_a") * col("n_b"))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("item_a"), col("item_b"))
      .limit(50)
  }
}
