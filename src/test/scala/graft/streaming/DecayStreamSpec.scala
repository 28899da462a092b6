package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

class DecayStreamSpec extends SparkSpec {
  import spark.implicits._

  private def evRows(): Seq[(Timestamp, String)] =
    graft.Tables.events(spark, sfDir).select($"ts", $"props")
      .as[(Timestamp, String)].collect().toSeq

  test("streamed decay cells == one-shot accumulate == registry x175") {
    val rows = evRows()
    assert(rows.nonEmpty)
    val state = java.nio.file.Files.createTempDirectory("dcy_state").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val q = DecayStream.trendingOnIngest(
      mem.toDF().toDF("ts", "props"), state,
      java.nio.file.Files.createTempDirectory("dcy_ckpt").toString)
    // uneven batches split MID-DAY (one day's events straddle batches),
    // so the (item, day) cells must compose by summation
    val (b1, tail) = rows.splitAt(rows.size / 3)
    val (b2, b3) = tail.splitAt(tail.size / 2)
    Seq(b1, b2, b3).foreach { b =>
      mem.addData(b: _*)
      q.processAllAvailable()
    }
    q.stop()
    val fromStream = DecayStream.report(spark, state).collect().toSeq

    val stateOnce = java.nio.file.Files.createTempDirectory("dcy_once").toString
    DecayStream.accumulateBatch(graft.Tables.events(spark, sfDir),
      stateOnce, 0L)
    val fromOnce = DecayStream.report(spark, stateOnce).collect().toSeq
    assert(fromStream === fromOnce)

    val fromRegistry = graft.SparkEntry
      .queries("x175_decayed_popularity")(spark, sfDir).collect().toSeq
    assert(fromStream === fromRegistry)
  }

  test("same-batch-id re-delivery replaces, never double-counts") {
    val rows = evRows()
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val state = java.nio.file.Files.createTempDirectory("dcy_redeliver").toString
    def acc(b: Seq[(Timestamp, String)], id: Long): Unit =
      DecayStream.accumulateBatch(b.toDF("ts", "props"), state, id)
    acc(b1, 0L); acc(b2, 1L)
    val once = DecayStream.report(spark, state).collect().toSeq
    acc(b2, 1L) // at-least-once replay of the same micro-batch
    val twice = DecayStream.report(spark, state).collect().toSeq
    assert(once === twice)
  }

  test("new days decay earlier bursts: the hot ranking re-orders over time") {
    // synthetic: item 1 bursts on day 1, item 2 trickles daily; after
    // enough quiet days item 2's recency beats item 1's old burst.
    import org.apache.spark.sql.functions.{lit, to_date}
    val state = java.nio.file.Files.createTempDirectory("dcy_decay").toString
    def cells(rows: Seq[(Int, String, Long)], id: Long): Unit =
      rows.toDF("item", "day", "cnt")
        .select($"item", to_date($"day").as("day"), $"cnt")
        .withColumn("batch_id", lit(id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id").parquet(state)
    cells(Seq((1, "2026-01-01", 40L), (2, "2026-01-01", 2L)), 0L)
    val early = DecayStream.report(spark, state).collect()
    assert(early.head.getInt(1) == 1) // the burst leads on day 1
    val d0 = java.time.LocalDate.of(2026, 1, 1)
    cells((1 to 40).map(d => (2, d0.plusDays(d).toString, 2L)), 1L)
    val late = DecayStream.report(spark, state).collect()
    // 40 days later: item 1's burst has decayed through ~5.6 half-lives
    // (40·2^(-40/7) ≈ 0.8) while item 2 keeps fresh mass
    assert(late.head.getInt(1) == 2,
      s"expected item 2 hot after decay, got ${late.toSeq}")
  }
}
