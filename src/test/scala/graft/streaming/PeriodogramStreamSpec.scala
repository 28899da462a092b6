package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

class PeriodogramStreamSpec extends SparkSpec {
  import spark.implicits._

  private def eventRows(): Seq[Timestamp] =
    graft.Tables.events(spark, sfDir)
      .selectExpr("ts").as[Timestamp].collect().toSeq

  test("streamed spectrum == one-shot accumulate == registry x308") {
    val rows = eventRows()
    assert(rows.nonEmpty)
    val state = java.nio.file.Files.createTempDirectory("pgram_state").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Timestamp]
    val q = PeriodogramStream.spectrumOnIngest(
      mem.toDF().toDF("ts"), state,
      java.nio.file.Files.createTempDirectory("pgram_ckpt").toString)
    // uneven batches so days straddle micro-batches: per-day counts must
    // COMPOSE (they are a commutative monoid, whatever the batch split)
    val (b1, tail) = rows.splitAt(rows.size / 4)
    val (b2, b3) = tail.splitAt(tail.size / 3)
    Seq(b1, b2, b3).foreach { b =>
      mem.addData(b: _*)
      q.processAllAvailable()
    }
    q.stop()
    val fromStream = PeriodogramStream.report(spark, state).collect().toSeq

    val stateOnce = java.nio.file.Files.createTempDirectory("pgram_once").toString
    PeriodogramStream.accumulateBatch(
      graft.Tables.events(spark, sfDir), stateOnce, 0L)
    val fromOnce = PeriodogramStream.report(spark, stateOnce).collect().toSeq
    assert(fromStream === fromOnce)

    val fromRegistry = graft.SparkEntry
      .queries("x308_periodogram")(spark, sfDir).collect().toSeq
    assert(fromStream === fromRegistry)
  }

  test("same-batch-id re-delivery replaces, never double-counts a day") {
    val rows = eventRows()
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val state = java.nio.file.Files.createTempDirectory("pgram_redeliver").toString
    def acc(b: Seq[Timestamp], id: Long): Unit =
      PeriodogramStream.accumulateBatch(b.toDF("ts"), state, id)
    acc(b1, 0L); acc(b2, 1L)
    val once = PeriodogramStream.report(spark, state).collect().toSeq
    acc(b2, 1L) // at-least-once replay of the same micro-batch
    val twice = PeriodogramStream.report(spark, state).collect().toSeq
    assert(once === twice)
  }

  test("per-batch state is bounded at the day grid, not batch size") {
    val rows = eventRows()
    val state = java.nio.file.Files.createTempDirectory("pgram_bound").toString
    PeriodogramStream.accumulateBatch(rows.toDF("ts"), state, 0L)
    val stateRows = spark.read.parquet(state).count()
    val days = graft.Tables.events(spark, sfDir)
      .selectExpr("CAST(ts AS DATE)").distinct().count()
    assert(stateRows === days,
      s"state has $stateRows rows for $days observed days")
  }
}
