package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

class WauStreamSpec extends SparkSpec {
  import spark.implicits._

  private def evRows(): Seq[(Long, Timestamp)] =
    graft.Tables.events(spark, sfDir).select($"user_id", $"ts")
      .as[(Long, Timestamp)].collect().toSeq

  test("streamed active-user state == one-shot accumulate == registry x163") {
    val rows = evRows()
    assert(rows.nonEmpty)
    val state = java.nio.file.Files.createTempDirectory("wau_state").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val q = WauStream.wauOnIngest(mem.toDF().toDF("user_id", "ts"), state,
      java.nio.file.Files.createTempDirectory("wau_ckpt").toString)
    // uneven batches split MID-DAY and MID-USER so (user, day) pairs must
    // merge as a set union across batches
    val (b1, tail) = rows.splitAt(rows.size / 3)
    val (b2, b3) = tail.splitAt(tail.size / 2)
    Seq(b1, b2, b3).foreach { b =>
      mem.addData(b: _*)
      q.processAllAvailable()
    }
    q.stop()
    val fromStream = WauStream.report(spark, state).collect().toSeq

    val stateOnce = java.nio.file.Files.createTempDirectory("wau_once").toString
    WauStream.accumulateBatch(graft.Tables.events(spark, sfDir), stateOnce, 0L)
    val fromOnce = WauStream.report(spark, stateOnce).collect().toSeq
    assert(fromStream === fromOnce)

    val fromRegistry = graft.SparkEntry
      .queries("x163_rolling_wau")(spark, sfDir).collect().toSeq
    assert(fromStream === fromRegistry)
  }

  test("re-delivered events never change the active-day set") {
    val rows = evRows()
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val state = java.nio.file.Files.createTempDirectory("wau_redeliver").toString
    WauStream.accumulateBatch(b1.toDF("user_id", "ts"), state, batchId = 0L)
    WauStream.accumulateBatch(b2.toDF("user_id", "ts"), state, batchId = 1L)
    val once = WauStream.report(spark, state).collect().toSeq
    // same-batch replay AND cross-batch duplicate delivery — the set-union
    // monoid must absorb both
    WauStream.accumulateBatch(b2.toDF("user_id", "ts"), state, batchId = 1L)
    WauStream.accumulateBatch(b1.toDF("user_id", "ts"), state, batchId = 2L)
    val twice = WauStream.report(spark, state).collect().toSeq
    assert(once === twice)
  }
}
