package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

class ConfSeqStreamSpec extends SparkSpec {
  import spark.implicits._

  private def eventRows(): Seq[(Timestamp, String)] =
    graft.Tables.events(spark, sfDir)
      .selectExpr("ts", "event_type").as[(Timestamp, String)]
      .collect().toSeq

  test("streamed confidence sequence == one-shot accumulate == registry x335") {
    val rows = eventRows()
    assert(rows.nonEmpty)
    val state = java.nio.file.Files.createTempDirectory("confseq_state").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val q = ConfSeqStream.bandOnIngest(
      mem.toDF().toDF("ts", "event_type"), state,
      java.nio.file.Files.createTempDirectory("confseq_ckpt").toString)
    // uneven batches so days straddle micro-batches: per-day (n, k)
    // partials must COMPOSE (commutative monoid, whatever the split)
    val (b1, tail) = rows.splitAt(rows.size / 4)
    val (b2, b3) = tail.splitAt(tail.size / 3)
    Seq(b1, b2, b3).foreach { b =>
      mem.addData(b: _*)
      q.processAllAvailable()
    }
    q.stop()
    val fromStream = ConfSeqStream.report(spark, state).collect().toSeq

    val stateOnce = java.nio.file.Files.createTempDirectory("confseq_once").toString
    ConfSeqStream.accumulateBatch(
      graft.Tables.events(spark, sfDir), stateOnce, 0L)
    val fromOnce = ConfSeqStream.report(spark, stateOnce).collect().toSeq
    assert(fromStream === fromOnce)

    val fromRegistry = graft.SparkEntry
      .queries("x335_confidence_sequence")(spark, sfDir).collect().toSeq
    assert(fromStream === fromRegistry)
  }

  test("same-batch-id re-delivery replaces, never double-counts a day") {
    val rows = eventRows()
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val state = java.nio.file.Files.createTempDirectory("confseq_redeliver").toString
    def acc(b: Seq[(Timestamp, String)], id: Long): Unit =
      ConfSeqStream.accumulateBatch(b.toDF("ts", "event_type"), state, id)
    acc(b1, 0L); acc(b2, 1L)
    val once = ConfSeqStream.report(spark, state).collect().toSeq
    acc(b2, 1L) // at-least-once replay of the same micro-batch
    val twice = ConfSeqStream.report(spark, state).collect().toSeq
    assert(once === twice)
  }

  test("state stays bounded across MANY batches: compaction folds history to the day grid") {
    val rows = eventRows()
    val state = java.nio.file.Files.createTempDirectory("confseq_many").toString
    // 30 micro-batches with compactAfter=6: without compaction the state
    // would hold 30 batch partitions (O(batches x days) rows — the
    // round-12 ADVICE defect); with it, at most compactAfter+1 partitions
    // (consolidated -1 + the recent tail) ever exist
    val chunks = rows.grouped(math.max(1, rows.size / 30)).toSeq
    chunks.zipWithIndex.foreach { case (b, i) =>
      ConfSeqStream.accumulateBatch(b.toDF("ts", "event_type"), state,
        i.toLong, compactAfter = 6)
    }
    val parts = spark.read.parquet(state)
      .select("batch_id").distinct().count()
    assert(parts <= 7, s"compaction did not bound state: $parts partitions")
    val days = graft.Tables.events(spark, sfDir)
      .selectExpr("CAST(ts AS DATE)").distinct().count()
    val stateRows = spark.read.parquet(state).count()
    assert(stateRows <= (parts + 1) * days,
      s"state has $stateRows rows for $days days across $parts partitions")
    // and the band off the compacted state equals the registry batch
    val fromStream = ConfSeqStream.report(spark, state).collect().toSeq
    val fromRegistry = graft.SparkEntry
      .queries("x335_confidence_sequence")(spark, sfDir).collect().toSeq
    assert(fromStream === fromRegistry)
    // re-delivery of the LAST batch after a compaction still replaces
    // (older history is folded, but the current batch keeps its partition)
    ConfSeqStream.accumulateBatch(chunks.last.toDF("ts", "event_type"),
      state, (chunks.size - 1).toLong, compactAfter = 6)
    val replayed = ConfSeqStream.report(spark, state).collect().toSeq
    assert(replayed === fromRegistry)
  }

  test("report before the first commit: empty band with the x335 schema, no throw") {
    val state = java.nio.file.Files.createTempDirectory("confseq_empty").toString
    val rep = ConfSeqStream.report(spark, state)
    assert(rep.columns.toSeq === Seq("day", "t", "n_events", "rate",
      "cs_lo", "cs_hi", "excludes_half", "excluded_half_ever"))
    assert(rep.count() === 0L)
  }

  test("per-batch state is bounded at the day grid, not batch size") {
    val rows = eventRows()
    val state = java.nio.file.Files.createTempDirectory("confseq_bound").toString
    ConfSeqStream.accumulateBatch(
      rows.toDF("ts", "event_type"), state, 0L)
    val stateRows = spark.read.parquet(state).count()
    val days = graft.Tables.events(spark, sfDir)
      .selectExpr("CAST(ts AS DATE)").distinct().count()
    assert(stateRows === days,
      s"state has $stateRows rows for $days observed days")
  }

  test("the monitor's stopping read: last row's excluded_half_ever is a safe decision") {
    val state = java.nio.file.Files.createTempDirectory("confseq_stop").toString
    ConfSeqStream.accumulateBatch(
      graft.Tables.events(spark, sfDir), state, 0L)
    val rep = ConfSeqStream.report(spark, state)
      .orderBy("day").collect()
    // excluded_half_ever is a running max: monotone non-decreasing 0/1
    val flags = rep.map(_.getAs[Long]("excluded_half_ever"))
    assert(flags.forall(f => f == 0L || f == 1L))
    assert(flags.zip(flags.tail).forall { case (a, b) => a <= b },
      "excluded_half_ever must be monotone (first crossing is final)")
  }
}
