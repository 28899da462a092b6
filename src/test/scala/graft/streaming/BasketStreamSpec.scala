package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

class BasketStreamSpec extends SparkSpec {
  import spark.implicits._

  private def evRows(): Seq[(Long, Timestamp, String)] =
    graft.Tables.events(spark, sfDir).select($"user_id", $"ts", $"props")
      .as[(Long, Timestamp, String)].collect().toSeq

  test("streamed basket state == one-shot accumulate == registry x162") {
    val rows = evRows()
    assert(rows.nonEmpty)
    val state = java.nio.file.Files.createTempDirectory("bsk_state").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = BasketStream.basketsOnIngest(
      mem.toDF().toDF("user_id", "ts", "props"), state,
      java.nio.file.Files.createTempDirectory("bsk_ckpt").toString)
    // uneven batches split MID-BASKET (a user-day's items straddle
    // batches), so the triple set must merge as a union
    val (b1, tail) = rows.splitAt(rows.size / 3)
    val (b2, b3) = tail.splitAt(tail.size / 2)
    Seq(b1, b2, b3).foreach { b =>
      mem.addData(b: _*)
      q.processAllAvailable()
    }
    q.stop()
    val fromStream = BasketStream.report(spark, state).collect().toSeq

    val stateOnce = java.nio.file.Files.createTempDirectory("bsk_once").toString
    BasketStream.accumulateBatch(graft.Tables.events(spark, sfDir),
      stateOnce, 0L)
    val fromOnce = BasketStream.report(spark, stateOnce).collect().toSeq
    assert(fromStream === fromOnce)

    val fromRegistry = graft.SparkEntry
      .queries("x162_assoc_rules")(spark, sfDir).collect().toSeq
    assert(fromStream === fromRegistry)
  }

  test("re-delivered events never change the basket set or the rules") {
    val rows = evRows()
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val state = java.nio.file.Files.createTempDirectory("bsk_redeliver").toString
    def acc(b: Seq[(Long, Timestamp, String)], id: Long): Unit =
      BasketStream.accumulateBatch(b.toDF("user_id", "ts", "props"),
        state, id)
    acc(b1, 0L); acc(b2, 1L)
    val once = BasketStream.report(spark, state).collect().toSeq
    acc(b2, 1L) // same-batch replay
    acc(b1, 2L) // cross-batch duplicate delivery
    val twice = BasketStream.report(spark, state).collect().toSeq
    assert(once === twice)
  }
}
