package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.max
import graft.SparkSpec

class DriftStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("streamed drift state == one-shot accumulate == registry x87") {
    val e = graft.Tables.embeddings(spark, sfDir)
    val mid = e.agg(max($"vec_id")).head.getLong(0) / 2
    val ref = e.filter($"vec_id" <= mid)
    val rest = e.filter($"vec_id" > mid)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect().toSeq
    assert(rest.nonEmpty)

    // ingest the drifted half as TWO micro-batches
    val stateStream = tmp("drift_state_stream")
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Array[Float])]
    val q = DriftStream.driftOnIngest(mem.toDF().toDF("vec_id", "embedding"),
      "embedding", stateStream, tmp("drift_ckpt"))
    val (h1, h2) = rest.splitAt(rest.size / 2)
    mem.addData(h1: _*)
    q.processAllAvailable()
    mem.addData(h2: _*)
    q.processAllAvailable()
    q.stop()
    val fromStream = DriftStream.report(spark, stateStream, ref, "embedding")
      .collect().toSeq

    // monoid fold: any batching sums to the same state
    val stateOnce = tmp("drift_state_once")
    DriftStream.accumulateBatch(e.filter($"vec_id" > mid), "embedding",
      stateOnce, batchId = 0L)
    val fromOnce = DriftStream.report(spark, stateOnce, ref, "embedding")
      .collect().toSeq
    assert(fromStream === fromOnce)

    // and the streaming path inherits the oracle-checked x87 semantics
    val fromRegistry = graft.SparkEntry
      .queries("x87_embedding_drift")(spark, sfDir).collect().toSeq
    assert(fromStream === fromRegistry)
  }

  test("re-delivered micro-batch does not double-count") {
    val e = graft.Tables.embeddings(spark, sfDir)
    val mid = e.agg(max($"vec_id")).head.getLong(0) / 2
    val ref = e.filter($"vec_id" <= mid)
    val ingest = e.filter($"vec_id" > mid)

    val state = tmp("drift_state_redeliver")
    DriftStream.accumulateBatch(ingest, "embedding", state, batchId = 7L)
    val once = DriftStream.report(spark, state, ref, "embedding").collect().toSeq
    // at-least-once delivery replays the SAME micro-batch id: the dynamic
    // partition overwrite must replace, not append
    DriftStream.accumulateBatch(ingest, "embedding", state, batchId = 7L)
    val twice = DriftStream.report(spark, state, ref, "embedding").collect().toSeq
    assert(once === twice)
  }
}
