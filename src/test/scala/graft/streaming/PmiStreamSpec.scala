package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

class PmiStreamSpec extends SparkSpec {
  import spark.implicits._

  private def eventRows(): Seq[(Long, Timestamp, String)] =
    graft.Tables.events(spark, sfDir)
      .select($"user_id", $"ts", $"props")
      .as[(Long, Timestamp, String)].collect().toSeq

  test("incremental co-occurrence ingest == registry x85") {
    val rows = eventRows()
    assert(rows.nonEmpty)
    val state = java.nio.file.Files.createTempDirectory("pmi_state").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = PmiStream.pmiOnIngest(
      mem.toDF().toDF("user_id", "ts", "props"), state,
      java.nio.file.Files.createTempDirectory("pmi_ckpt").toString)
    // three uneven batches: contexts straddle batch boundaries, so the
    // incremental cross-pairs path (new x already-seen) is exercised
    val (b1, tail) = rows.splitAt(rows.size / 3)
    val (b2, b3) = tail.splitAt(tail.size / 2)
    Seq(b1, b2, b3).foreach { b =>
      mem.addData(b: _*)
      q.processAllAvailable()
    }
    q.stop()
    val incremental = PmiStream.report(spark, state).collect().toSeq
    val registry = graft.SparkEntry.queries("x85_item_pmi")(spark, sfDir)
      .collect().toSeq
    assert(incremental === registry)
  }

  test("re-delivered micro-batch leaves pair state unchanged") {
    val rows = eventRows()
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val state = java.nio.file.Files.createTempDirectory("pmi_redeliver").toString
    PmiStream.ingestBatch(b1.toDF("user_id", "ts", "props"), state, batchId = 0L)
    PmiStream.ingestBatch(b2.toDF("user_id", "ts", "props"), state, batchId = 1L)
    val once = PmiStream.report(spark, state).collect().toSeq
    // at-least-once delivery replays batch 1: its partitions must be
    // REPLACED with identical content, not appended to
    PmiStream.ingestBatch(b2.toDF("user_id", "ts", "props"), state, batchId = 1L)
    val twice = PmiStream.report(spark, state).collect().toSeq
    assert(once === twice)
  }
}
