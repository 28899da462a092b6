package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

class EwmaStreamSpec extends SparkSpec {
  import spark.implicits._

  private def eventRows(): Seq[Timestamp] =
    graft.Tables.events(spark, sfDir)
      .selectExpr("ts").as[Timestamp].collect().toSeq

  test("streamed EWMA chart == one-shot accumulate == registry x236") {
    val rows = eventRows()
    assert(rows.nonEmpty)
    val state = java.nio.file.Files.createTempDirectory("ewma_state").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Timestamp]
    val q = EwmaStream.ewmaOnIngest(
      mem.toDF().toDF("ts"), state,
      java.nio.file.Files.createTempDirectory("ewma_ckpt").toString)
    // uneven batches so days straddle micro-batches: per-day counts must
    // COMPOSE (they are a commutative monoid, whatever the batch split)
    val (b1, tail) = rows.splitAt(rows.size / 4)
    val (b2, b3) = tail.splitAt(tail.size / 3)
    Seq(b1, b2, b3).foreach { b =>
      mem.addData(b: _*)
      q.processAllAvailable()
    }
    q.stop()
    val fromStream = EwmaStream.report(spark, state).collect().toSeq

    val stateOnce = java.nio.file.Files.createTempDirectory("ewma_once").toString
    EwmaStream.accumulateBatch(
      graft.Tables.events(spark, sfDir), stateOnce, 0L)
    val fromOnce = EwmaStream.report(spark, stateOnce).collect().toSeq
    assert(fromStream === fromOnce)

    val fromRegistry = graft.SparkEntry
      .queries("x236_ewma_chart")(spark, sfDir).collect().toSeq
    assert(fromStream === fromRegistry)
  }

  test("same-batch-id re-delivery replaces, never double-counts a day") {
    val rows = eventRows()
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val state = java.nio.file.Files.createTempDirectory("ewma_redeliver").toString
    def acc(b: Seq[Timestamp], id: Long): Unit =
      EwmaStream.accumulateBatch(b.toDF("ts"), state, id)
    acc(b1, 0L); acc(b2, 1L)
    val once = EwmaStream.report(spark, state).collect().toSeq
    acc(b2, 1L) // at-least-once replay of the same micro-batch
    val twice = EwmaStream.report(spark, state).collect().toSeq
    assert(once === twice)
  }

  test("per-batch state is bounded at the day grid, not batch size") {
    val rows = eventRows()
    val state = java.nio.file.Files.createTempDirectory("ewma_bound").toString
    EwmaStream.accumulateBatch(rows.toDF("ts"), state, 0L)
    val stateRows = spark.read.parquet(state).count()
    val days = graft.Tables.events(spark, sfDir)
      .selectExpr("CAST(ts AS DATE)").distinct().count()
    assert(stateRows === days,
      s"state has $stateRows rows for $days observed days")
  }
}
