package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

class SeqMineStreamSpec extends SparkSpec {
  import spark.implicits._

  private def evRows(): Seq[(Long, Timestamp, Long, String)] =
    graft.Tables.events(spark, sfDir)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .as[(Long, Timestamp, Long, String)].collect().toSeq

  test("streamed prefix-span state == one-shot accumulate == registry x159") {
    val rows = evRows()
    assert(rows.nonEmpty)
    val state = java.nio.file.Files.createTempDirectory("seq_state").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String)]
    val q = SeqMineStream.seqMineOnIngest(
      mem.toDF().toDF("user_id", "ts", "event_id", "event_type"), state,
      java.nio.file.Files.createTempDirectory("seq_ckpt").toString)
    // uneven batches split MID-USER (rows arrive in file order, not
    // user-grouped), so per-user first-8 must merge partial mins
    val (b1, tail) = rows.splitAt(rows.size / 3)
    val (b2, b3) = tail.splitAt(tail.size / 2)
    Seq(b1, b2, b3).foreach { b =>
      mem.addData(b: _*)
      q.processAllAvailable()
    }
    q.stop()
    val fromStream = SeqMineStream.report(spark, state).collect().toSeq

    val stateOnce = java.nio.file.Files.createTempDirectory("seq_once").toString
    SeqMineStream.accumulateBatch(
      graft.Tables.events(spark, sfDir), stateOnce, 0L)
    val fromOnce = SeqMineStream.report(spark, stateOnce).collect().toSeq
    assert(fromStream === fromOnce)

    val fromRegistry = graft.SparkEntry
      .queries("x159_prefixspan")(spark, sfDir).collect().toSeq
    assert(fromStream === fromRegistry)
  }

  test("re-delivered events never change the first-8 pattern state") {
    val rows = evRows()
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val state = java.nio.file.Files.createTempDirectory("seq_redeliver").toString
    SeqMineStream.accumulateBatch(b1.toDF("user_id", "ts", "event_id",
      "event_type"), state, batchId = 0L)
    SeqMineStream.accumulateBatch(b2.toDF("user_id", "ts", "event_id",
      "event_type"), state, batchId = 1L)
    val once = SeqMineStream.report(spark, state).collect().toSeq
    // same-batch replay (the dynamic-overwrite guarantee)
    SeqMineStream.accumulateBatch(b2.toDF("user_id", "ts", "event_id",
      "event_type"), state, batchId = 1L)
    // CROSS-batch duplicate delivery: b1's rows show up again under a new
    // batch id — the min-monoid + report dedup must absorb even that
    SeqMineStream.accumulateBatch(b1.toDF("user_id", "ts", "event_id",
      "event_type"), state, batchId = 2L)
    val twice = SeqMineStream.report(spark, state).collect().toSeq
    assert(once === twice)
  }
}
