package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

class HoltStreamSpec extends SparkSpec {
  import spark.implicits._

  private def evRows(): Seq[(String, Timestamp)] =
    graft.Tables.events(spark, sfDir).select($"event_type", $"ts")
      .as[(String, Timestamp)].collect().toSeq

  test("streamed Holt state == one-shot accumulate == registry x122") {
    val rows = evRows()
    assert(rows.nonEmpty)
    val state = java.nio.file.Files.createTempDirectory("holt_state").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp)]
    val q = HoltStream.holtOnIngest(mem.toDF().toDF("event_type", "ts"),
      state, java.nio.file.Files.createTempDirectory("holt_ckpt").toString)
    // uneven batches split MID-DAY so per-(type, day) partials must merge
    val (b1, tail) = rows.splitAt(rows.size / 3)
    val (b2, b3) = tail.splitAt(tail.size / 2)
    Seq(b1, b2, b3).foreach { b =>
      mem.addData(b: _*)
      q.processAllAvailable()
    }
    q.stop()
    val fromStream = HoltStream.report(spark, state).collect().toSeq

    val stateOnce = java.nio.file.Files.createTempDirectory("holt_once").toString
    HoltStream.accumulateBatch(graft.Tables.events(spark, sfDir), stateOnce, 0L)
    val fromOnce = HoltStream.report(spark, stateOnce).collect().toSeq
    assert(fromStream === fromOnce)

    val fromRegistry = graft.SparkEntry
      .queries("x122_holt_trend")(spark, sfDir).collect().toSeq
    assert(fromStream === fromRegistry)
  }

  test("re-delivered micro-batch does not shift the forecast") {
    val rows = evRows()
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val state = java.nio.file.Files.createTempDirectory("holt_redeliver").toString
    HoltStream.accumulateBatch(b1.toDF("event_type", "ts"), state, batchId = 0L)
    HoltStream.accumulateBatch(b2.toDF("event_type", "ts"), state, batchId = 1L)
    val once = HoltStream.report(spark, state).collect().toSeq
    HoltStream.accumulateBatch(b2.toDF("event_type", "ts"), state, batchId = 1L)
    val twice = HoltStream.report(spark, state).collect().toSeq
    assert(once === twice)
  }
}
