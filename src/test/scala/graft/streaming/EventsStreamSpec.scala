package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class EventsStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming tumbling agg over MemoryStream matches batch result") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")

    val q = EventsStream.tumblingAgg(df, "10 minutes", "1 hour")
      .writeStream.format("memory").queryName("tumbling_test")
      .outputMode("complete").start()
    mem.addData(
      (ts("2024-01-01 00:01:00"), "click", 1.0),
      (ts("2024-01-01 00:04:00"), "click", 2.0),
      (ts("2024-01-01 00:11:00"), "click", 4.0),
      (ts("2024-01-01 00:12:00"), "view", 8.0))
    q.processAllAvailable()
    val rows = spark.sql("SELECT * FROM tumbling_test ORDER BY win_start, event_type")
      .collect()
    q.stop()
    assert(rows.length === 3)
    assert(rows(0).getTimestamp(0) === ts("2024-01-01 00:00:00"))
    assert(rows(0).getLong(2) === 2L && rows(0).getDouble(3) === 3.0)
    assert(rows(1).getLong(2) === 1L && rows(1).getDouble(3) === 4.0)

    // batch twin produces the identical aggregation
    val batch = EventsStream.tumblingAgg(
      Seq(
        (ts("2024-01-01 00:01:00"), "click", 1.0),
        (ts("2024-01-01 00:04:00"), "click", 2.0),
        (ts("2024-01-01 00:11:00"), "click", 4.0),
        (ts("2024-01-01 00:12:00"), "view", 8.0)).toDF("ts", "event_type", "value"),
      "10 minutes", "1 hour").orderBy("win_start", "event_type").collect()
    assert(batch.map(_.toSeq).toSeq === rows.map(_.toSeq).toSeq)
  }

  test("dedup within watermark removes replayed events") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val df = mem.toDF().toDF("event_id", "ts", "value")
    val q = EventsStream.dedupWithinWatermark(df, "1 hour")
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    mem.addData((1L, ts("2024-01-01 00:00:01"), 1.0))
    q.processAllAvailable()
    mem.addData((1L, ts("2024-01-01 00:00:01"), 1.0), // exact replay
      (2L, ts("2024-01-01 00:00:02"), 2.0))
    q.processAllAvailable()
    val n = spark.sql("SELECT count(*) FROM dedup_test").head().getLong(0)
    q.stop()
    assert(n === 2L)
  }

  test("stream-stream interval join matches within-gap clicks only") {
    implicit val sqlCtx = spark.sqlContext
    val pMem = MemoryStream[(Long, Long, Timestamp)]
    val cMem = MemoryStream[(Long, Long, Timestamp)]
    val purchases = pMem.toDF().toDF("event_id", "user_id", "ts")
    val clicks = cMem.toDF().toDF("event_id", "user_id", "ts")
    val q = EventsStream.purchaseClickJoin(purchases, clicks, gapMinutes = 5)
      .writeStream.format("memory").queryName("ss_join_test")
      .outputMode("append").start()
    cMem.addData(
      (101L, 7L, ts("2024-01-01 00:00:00")), // within 5 min of purchase
      (102L, 7L, ts("2024-01-01 00:03:00")), // within
      (103L, 7L, ts("2023-12-31 23:50:00")), // too early
      (104L, 9L, ts("2024-01-01 00:03:30"))) // other user
    pMem.addData((1L, 7L, ts("2024-01-01 00:04:00")))
    q.processAllAvailable()
    val joined = spark.sql("SELECT click_id FROM ss_join_test ORDER BY click_id")
      .as[Long].collect().toSeq
    q.stop()
    assert(joined === Seq(101L, 102L))
  }

  test("stream-stream LEFT OUTER interval join emits unmatched purchases " +
      "with null clicks, and matches the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val pMem = MemoryStream[(Long, Long, Timestamp)]
    val cMem = MemoryStream[(Long, Long, Timestamp)]
    val purchases = pMem.toDF().toDF("event_id", "user_id", "ts")
    val clicks = cMem.toDF().toDF("event_id", "user_id", "ts")
    val q = EventsStream.purchaseClickLeftJoin(purchases, clicks,
        gapMinutes = 5, watermark = "10 minutes")
      .writeStream.format("memory").queryName("ss_left_join_test")
      .outputMode("append").start()
    cMem.addData(
      (101L, 7L, ts("2024-01-01 00:00:00")), // within 5 min of purchase 1
      (103L, 7L, ts("2023-12-31 23:50:00"))) // too early for anything
    pMem.addData(
      (1L, 7L, ts("2024-01-01 00:04:00")), // matched
      (2L, 9L, ts("2024-01-01 00:04:00"))) // user 9 never clicks → null row
    q.processAllAvailable()
    // push both watermarks past 00:04 so the unmatched purchase is provably
    // unmatched; null rows surface in the batch AFTER the watermark moves
    pMem.addData((99L, 1L, ts("2024-01-01 01:00:00")))
    cMem.addData((199L, 2L, ts("2024-01-01 01:00:00")))
    q.processAllAvailable()
    pMem.addData((98L, 1L, ts("2024-01-01 01:30:00")))
    cMem.addData((198L, 2L, ts("2024-01-01 01:30:00")))
    q.processAllAvailable()
    val rows = spark.sql(
      """SELECT purchase_id, click_id FROM ss_left_join_test
        |WHERE purchase_id IN (1, 2) ORDER BY purchase_id""".stripMargin)
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    q.stop()
    assert(rows.toSeq === Seq((1L, 101L), (2L, -1L)))

    // batch twin: identical left-join semantics on plain DataFrames
    val bp = Seq((1L, 7L, ts("2024-01-01 00:04:00")),
      (2L, 9L, ts("2024-01-01 00:04:00"))).toDF("event_id", "user_id", "ts")
    val bc = Seq((101L, 7L, ts("2024-01-01 00:00:00")),
      (103L, 7L, ts("2023-12-31 23:50:00"))).toDF("event_id", "user_id", "ts")
    val batch = EventsStream.purchaseClickLeftJoin(bp, bc, gapMinutes = 5)
      .orderBy("purchase_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(batch.toSeq === rows.toSeq)
  }

  test("sessionize groups events by inactivity gap") {
    val events = Seq(
      EventsStream.Event(1, ts("2024-01-01 00:00:00"), 7L, "click", 1.0),
      EventsStream.Event(2, ts("2024-01-01 00:10:00"), 7L, "click", 2.0),
      EventsStream.Event(3, ts("2024-01-01 02:00:00"), 7L, "click", 4.0), // new session
      EventsStream.Event(4, ts("2024-01-01 00:05:00"), 9L, "view", 8.0)).toDS()
    val sessions = EventsStream.sessionize(spark, events, gapMs = 30 * 60 * 1000L)
      .collect().sortBy(s => (s.user_id, s.start.getTime))
    assert(sessions.length === 3)
    assert(sessions(0).user_id === 7L && sessions(0).n_events === 2
      && sessions(0).total_value === 3.0)
    assert(sessions(1).user_id === 7L && sessions(1).n_events === 1)
    assert(sessions(2).user_id === 9L && sessions(2).n_events === 1)
  }

  test("streaming sessionize spans micro-batches and closes by timeout") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventsStream.Event]
    val q = EventsStream.sessionize(spark, mem.toDS(), gapMs = 30 * 60 * 1000L)
      .writeStream.format("memory").queryName("sessionize_test")
      .outputMode("append").start()
    // batch 1: user 7 opens a session
    mem.addData(
      EventsStream.Event(1, ts("2024-01-01 00:00:00"), 7L, "click", 1.0),
      EventsStream.Event(2, ts("2024-01-01 00:10:00"), 7L, "click", 2.0))
    q.processAllAvailable()
    // batch 2: the SAME session continues in a later micro-batch; user 9's
    // late event will push the watermark past user 7's last+gap
    mem.addData(
      EventsStream.Event(3, ts("2024-01-01 00:20:00"), 7L, "click", 4.0),
      EventsStream.Event(4, ts("2024-01-01 05:00:00"), 9L, "view", 8.0))
    q.processAllAvailable()
    // batch 3: watermark (04:00) is now past user 7's 00:50 timeout — the
    // spanning session must be emitted exactly once, with all 3 events
    mem.addData(
      EventsStream.Event(5, ts("2024-01-01 06:00:00"), 9L, "view", 16.0))
    q.processAllAvailable()
    val rows = spark.sql(
      "SELECT user_id, n_events, total_value FROM sessionize_test ORDER BY user_id")
      .collect()
    q.stop()
    val u7 = rows.filter(_.getLong(0) == 7L)
    assert(u7.length === 1) // once, not once per micro-batch
    assert(u7.head.getInt(1) === 3 && u7.head.getDouble(2) === 7.0)
  }

  test("native session_window agrees with the custom-state sessionize") {
    val events = Seq(
      EventsStream.Event(1, ts("2024-01-01 00:00:00"), 7L, "click", 1.0),
      EventsStream.Event(2, ts("2024-01-01 00:10:00"), 7L, "click", 2.0),
      EventsStream.Event(3, ts("2024-01-01 02:00:00"), 7L, "click", 4.0),
      EventsStream.Event(4, ts("2024-01-01 00:05:00"), 9L, "view", 8.0))
    val native = EventsStream.sessionWindowAgg(events.toDF(), "30 minutes")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        r.getLong(2), r.getDouble(3))).toSet
    val custom = EventsStream.sessionize(spark, events.toDS(), 30 * 60 * 1000L)
      .collect().map(s => (s.user_id, s.start, s.n_events.toLong, s.total_value)).toSet
    assert(native === custom)
  }

  test("harness events table flows through the streaming aggregations") {
    val ev = Tables.events(spark, sfDir)
    val out = EventsStream.tumblingAgg(ev).count()
    assert(out > 0)
    assert(EventsStream.slidingAgg(ev).count() >= out) // sliding ⊇ tumbling starts
  }

  test("stateful aggregation runs on the RocksDB state store (production " +
      "backend) with identical results") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Timestamp, String, Double)]
      val df = mem.toDF().toDF("ts", "event_type", "value")
      val q = EventsStream.tumblingAgg(df, "10 minutes", "1 hour")
        .writeStream.format("memory").queryName("rocksdb_test")
        .outputMode("complete").start()
      mem.addData(
        (ts("2024-01-01 00:01:00"), "click", 1.0),
        (ts("2024-01-01 00:04:00"), "click", 2.0))
      mem.addData((ts("2024-01-01 00:06:00"), "click", 4.0)) // same window, batch 2
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM rocksdb_test ORDER BY win_start").collect()
      q.stop()
      // state merged across micro-batches through RocksDB
      assert(rows.length === 1)
      assert(rows(0).getLong(2) === 3L && rows(0).getDouble(3) === 7.0)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("windowed CMS sketch: streaming cells equal the batch fold and " +
      "answer per-key frequencies") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val df = mem.toDF().toDF("ts", "user_id")

    val q = EventsStream.windowedCmsSketch(df, "10 minutes", "1 hour")
      .writeStream.format("memory").queryName("cms_win_test")
      .outputMode("complete").start()
    val data = Seq(
      (ts("2024-01-01 00:01:00"), 7L), (ts("2024-01-01 00:02:00"), 7L),
      (ts("2024-01-01 00:03:00"), 9L),
      (ts("2024-01-01 00:12:00"), 7L))
    mem.addData(data.take(2))
    mem.addData(data.drop(2)) // user 7's window-0 count spans micro-batches
    q.processAllAvailable()
    val rows = spark.sql("SELECT * FROM cms_win_test ORDER BY win_start").collect()
    q.stop()
    assert(rows.length === 2)
    val cells0 = rows(0).getSeq[Long](1).toArray
    import graft.functions.CmsSketch
    assert(CmsSketch.estimate(cells0, 7L, 3, 64) === 2L)
    assert(CmsSketch.estimate(cells0, 9L, 3, 64) === 1L)
    assert(CmsSketch.estimate(rows(1).getSeq[Long](1).toArray, 7L, 3, 64) === 1L)

    val batch = EventsStream.windowedCmsSketch(
        data.toDF("ts", "user_id"), "10 minutes", "1 hour")
      .orderBy("win_start").collect()
    assert(batch.map(_.toSeq).toSeq === rows.map(_.toSeq).toSeq)
  }

  test("windowed HLL sketch: streaming registers equal the batch fold") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val df = mem.toDF().toDF("ts", "user_id")

    val q = EventsStream.windowedDistinctSketch(df, "10 minutes", "1 hour")
      .writeStream.format("memory").queryName("hll_win_test")
      .outputMode("complete").start()
    val data = Seq(
      (ts("2024-01-01 00:01:00"), 1L), (ts("2024-01-01 00:02:00"), 2L),
      (ts("2024-01-01 00:03:00"), 1L), // dup user in window 0
      (ts("2024-01-01 00:11:00"), 3L), (ts("2024-01-01 00:12:00"), 4L),
      (ts("2024-01-01 00:13:00"), 5L))
    // two adds → two micro-batches, so window-0 state must merge partials
    mem.addData(data.take(3))
    mem.addData(data.drop(3))
    q.processAllAvailable()
    val rows = spark.sql("SELECT * FROM hll_win_test ORDER BY win_start").collect()
    q.stop()
    assert(rows.length === 2)

    val batch = EventsStream.windowedDistinctSketch(
        data.toDF("ts", "user_id"), "10 minutes", "1 hour")
      .orderBy("win_start").collect()
    assert(batch.map(_.toSeq).toSeq === rows.map(_.toSeq).toSeq)
    // sanity: tiny windows estimate exactly via the linear-counting branch
    assert(rows(0).getLong(2) === 62L) // 64 - 2 distinct users
    assert(rows(1).getLong(2) === 61L) // 64 - 3 distinct users
  }

  test("native session_window == q38's lag-gap sessionization on the sf corpus") {
    // Two independent formulations of the same 30-min cut — the engine's
    // gap-merged window state vs the relational lag+running-sum device —
    // must produce identical (user, start, n_events) sessions on real
    // data. They can differ only on a gap EXACTLY equal to the threshold
    // (half-open window merge vs strict >), which a real-valued event
    // stream does not produce; this is the corpus-scale proof.
    val native = EventsStream.sessionWindowAgg(
        Tables.events(spark, sfDir), "30 minutes")
      .select(col("user_id"), col("win_start"), col("n_events"))
    val relational = graft.SparkEntry.queries("q38_sessionize")(spark, sfDir)
      .select(col("user_id"), col("session_start").as("win_start"),
        col("n_events"))
    assert(native.count() === relational.count())
    assert(native.exceptAll(relational).isEmpty &&
      relational.exceptAll(native).isEmpty)
  }
}
