package graft.streaming

import scala.util.chaining._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Incremental inverted-index maintenance — the stream-side twin of the
  * x106 BM25 query, completing the lexical index's lifecycle the same way
  * the ANN index has build (x70) / streaming ingest (AnnStream) / retrain
  * (x83): documents arrive as a stream, the index STATE (postings + doc
  * roster) accumulates per micro-batch, and serving reads only state —
  * the corpus is never rescanned.
  *
  * Tokenization is row-local within a document, so unlike [[PmiStream]]
  * (whose pair counts straddle batches) a batch's contribution is purely
  * its own rows: ingest is embarrassingly incremental, and the corpus
  * statistics BM25 needs (df, avgdl, N) fall out of unioning state
  * partitions. What must still be engineered is idempotency — state is
  * batch_id-partitioned and written with dynamic partition overwrite, so
  * an at-least-once re-delivery REPLACES its own contribution instead of
  * double-counting (the [[DriftStream]]/[[PmiStream]] discipline;
  * PostingsStreamSpec proves re-delivery is a no-op).
  *
  * State layout under `stateDir`:
  *  - `postings/`: each batch's (doc_id, term, tf) rows;
  *  - `docs/`: each batch's doc_id roster (kept separately because BM25's
  *    N counts token-less documents, which own no postings).
  */
object PostingsStream {

  /** One micro-batch of (doc_id, text) rows → its postings + roster
    * partitions. Documents are atomic (a doc's text never splits across
    * batches), so per-batch cost is the batch's own token mass. */
  def ingestBatch(batch: DataFrame, stateDir: String, batchId: Long,
      compactAfter: Int = 12): Unit = {
    graft.ops.Bm25.termFreqs(batch)
      .pipe(StateCompaction.writeBatchPartition(_, s"$stateDir/postings", batchId))
    batch.select("doc_id")
      .pipe(StateCompaction.writeBatchPartition(_, s"$stateDir/docs", batchId))
    // postings are per-doc atomic (no cross-batch aggregation), so the
    // fold is an identity re-tag: rows unchanged, but a years-long
    // monitor's state stops accreting one directory per micro-batch —
    // the small-files listing cost every ingest and serve pays. The doc
    // roster dedups (the report distincts it for N anyway).
    StateCompaction.compactIfNeeded(batch.sparkSession,
      s"$stateDir/postings", batchId, compactAfter)(identity)
    StateCompaction.compactDistinct(batch.sparkSession,
      s"$stateDir/docs", batchId, compactAfter)
  }

  /** Wire [[ingestBatch]] into a foreachBatch sink over a document stream
    * carrying (doc_id, text). */
  def indexOnIngest(stream: DataFrame, stateDir: String,
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, id: Long) =>
        ingestBatch(b, stateDir, id)
      }
      .start()

  /** BM25 top-k served off the accumulated state through the SAME
    * [[graft.ops.Bm25]] expressions as registry x106 — the incremental
    * path inherits the oracle-checked semantics by construction. */
  def report(spark: SparkSession, stateDir: String, k: Int = 10): DataFrame = {
    val tf = StateCompaction.read(spark, s"$stateDir/postings")
      .select("doc_id", "term", "tf")
    val nDocs = StateCompaction.read(spark, s"$stateDir/docs")
      .select("doc_id").distinct()
      .agg(count(lit(1)).as("n_docs"))
    graft.ops.Bm25.topK(tf, nDocs, k)
  }
}
