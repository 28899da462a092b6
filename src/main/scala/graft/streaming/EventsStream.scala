package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming surface over events-shaped data (SURVEY §2.9 —
  * extension, not port: the reference is batch-only; the harness `events`
  * table motivates it).
  *
  * Everything here works identically on a batch DataFrame and a streaming one
  * (same declarative plan), which is how it is unit-tested (MemoryStream) and
  * oracle-checked (q26 is the batch twin of [[tumblingAgg]]).
  */
object EventsStream {

  /** Tumbling-window counts/sums with a watermark for state eviction.
    * Epoch-aligned windows — matches DuckDB time_bucket. */
  def tumblingAgg(events: DataFrame, windowLen: String = "10 minutes",
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).getField("start").as("win_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** Sliding windows (1h length, 10min slide). */
  def slidingAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "10 minutes").getField("start").as("win_start"))
      .agg(count(lit(1)).as("n"))

  /** Exactly-once-style dedup by event_id within the watermark horizon. */
  def dedupWithinWatermark(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicates("event_id", "ts")

  /** Distinct users per tumbling window as a streaming HLL sketch fold
    * ([[graft.functions.HllAggregator]]): each micro-batch merges its
    * partial registers into the window's state — the SAME mergeable
    * property that makes the batch sketch a map-side fold makes it
    * incrementally updatable here, so per-window state is m bytes no matter
    * how many users pass through. Emits the two integer summaries plus the
    * exact distinct count (valid in the batch/test regime; at stream scale
    * the exact column is what you'd drop). */
  def windowedDistinctSketch(events: DataFrame, windowLen: String = "10 minutes",
      watermark: String = "30 minutes"): DataFrame = {
    import graft.functions.{HllAggregator, HllSketch}
    val agg = new HllAggregator(64)
    val hllUdaf = udaf(agg)
    val statsUdf = udf { regs: Array[Byte] => HllSketch.summarize(regs, agg.maxRank) }
    // user ids are already integral: fold into the 31-bit hash domain the
    // same way poly31 would land (mod the Mersenne prime), SQL-replayable
    val h = pmod(col("user_id"), lit(2147483647L))
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).getField("start").as("win_start"))
      .agg(hllUdaf(h).as("regs"),
        approx_count_distinct(col("user_id")).as("builtin_est"))
      .select(col("win_start"), statsUdf(col("regs")).as("st"), col("builtin_est"))
      .select(col("win_start"), col("st._1").as("sum_pow"),
        col("st._2").as("n_zero_regs"), col("builtin_est"))
  }

  /** Per-window Count-Min cells as a streaming fold
    * ([[graft.functions.CmsAggregator]]): the heavy-hitter companion of
    * [[windowedDistinctSketch]] — per-window state is depth·width Longs
    * regardless of event volume, partials merge across micro-batches by
    * cell addition, and any key's frequency estimate is readable from the
    * emitted cells after the fact (min over rows), which a plain
    * `groupBy(key).count()` stream can only answer for keys it kept state
    * for. */
  def windowedCmsSketch(events: DataFrame, windowLen: String = "10 minutes",
      watermark: String = "30 minutes", depth: Int = 3,
      width: Int = 64): DataFrame = {
    import graft.functions.CmsAggregator
    val agg = new CmsAggregator(depth, width)
    val cms = udaf(agg)
    val h = pmod(col("user_id"), lit(2147483647L))
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).getField("start").as("win_start"))
      .agg(cms(h).as("cells"), count(lit(1)).as("n_events"))
  }

  /** Stream-stream interval join: each purchase joined to clicks of the same
    * user within the preceding `gapMinutes`. Both sides watermarked so the
    * join state is bounded — the streaming twin of
    * [[graft.ops.Relational.rangeJoinWithinGap]]. */
  def purchaseClickJoin(purchases: DataFrame, clicks: DataFrame,
      gapMinutes: Int = 5): DataFrame = {
    val p = purchases.withWatermark("ts", "1 hour")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))
    val c = clicks.withWatermark("ts", "1 hour")
      .select(col("user_id").as("c_user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    p.join(c,
      col("user_id") === col("c_user_id") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $gapMinutes MINUTES"))
      .select(col("purchase_id"), col("user_id"), col("purchase_ts"),
        col("click_id"), col("click_ts"))
  }

  /** Stream-stream LEFT OUTER interval join — the one join mode
    * [[purchaseClickJoin]] lacks: EVERY purchase is emitted, click columns
    * null when no same-user click landed in the preceding `gapMinutes`.
    * Both sides watermarked and the condition time-bounded, so Spark can
    * (a) evict join state once the watermark passes the interval and
    * (b) prove when an unmatched purchase can no longer match, emitting its
    * null row exactly once — unbounded state on either side would otherwise
    * make outer results undecidable on a stream. On a batch DataFrame the
    * watermark is a no-op and this is a plain left join (how the spec
    * proves stream == batch). */
  def purchaseClickLeftJoin(purchases: DataFrame, clicks: DataFrame,
      gapMinutes: Int = 5, watermark: String = "10 minutes"): DataFrame = {
    val p = purchases.withWatermark("ts", watermark)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id").as("c_user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    p.join(c,
        col("user_id") === col("c_user_id") &&
          col("click_ts") <= col("purchase_ts") &&
          col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $gapMinutes MINUTES"),
        "left_outer")
      .select(col("purchase_id"), col("user_id"), col("purchase_ts"),
        col("click_id"), col("click_ts"))
  }

  /** Session windows via Spark's NATIVE session_window (gap-merged windows
    * managed by the engine's state store) — the declarative twin of the
    * custom-state [[sessionize]]; per (user, session): event count and value
    * sum. Works identically on batch and streaming input. */
  def sessionWindowAgg(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("user_id"), col("sw.start").as("win_start"),
        col("n_events"), col("total_value"))
  }

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class Session(user_id: Long, n_events: Int, start: Timestamp,
      end: Timestamp, total_value: Double)
  // public: the streaming state encoder's generated code instantiates it
  // reflectively (a private nested case class fails Janino compilation)
  final case class SessionState(n: Int, start: Long, last: Long, total: Double)

  /** Session windows via flatMapGroupsWithState: a session closes after
    * `gapMs` of user inactivity. Custom state — the KeyValueGroupedDataset
    * path (SURVEY §2.9).
    *
    * Streaming input: the open session is KEPT in state across micro-batches
    * and closed by event-time timeout once the watermark passes last+gap —
    * a session spanning two micro-batches is emitted exactly once. Requires
    * a watermark on `ts` (applied here via `watermarkDelay`).
    *
    * Batch input: all data is present by definition, so trailing sessions
    * close at end-of-group (identical results to the q38 window twin). */
  def sessionize(spark: SparkSession, events: Dataset[Event],
      gapMs: Long = 30 * 60 * 1000L,
      watermarkDelay: String = "1 hour"): Dataset[Session] = {
    import spark.implicits._
    val streaming = events.isStreaming
    val src = if (streaming) events.withWatermark("ts", watermarkDelay) else events
    src
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        if (streaming) GroupStateTimeout.EventTimeTimeout
        else GroupStateTimeout.NoTimeout)(
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            // watermark passed last+gap with no new events: close the session
            val s = state.get
            state.remove()
            Iterator.single(
              Session(userId, s.n, new Timestamp(s.start), new Timestamp(s.last), s.total))
          } else {
            val sorted = it.toSeq.sortBy(_.ts.getTime)
            val out = Seq.newBuilder[Session]
            var cur: Option[SessionState] = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(s.copy(n = s.n + 1, last = t, total = s.total + e.value))
                case Some(s) =>
                  out += Session(userId, s.n, new Timestamp(s.start), new Timestamp(s.last), s.total)
                  cur = Some(SessionState(1, t, t, e.value))
                case None =>
                  cur = Some(SessionState(1, t, t, e.value))
              }
            }
            if (streaming) {
              // keep the open session; timeout fires when the watermark
              // passes last+gap (clamped above the current watermark, which
              // setTimeoutTimestamp requires)
              cur.foreach { s =>
                state.update(s)
                state.setTimeoutTimestamp(
                  math.max(s.last + gapMs, state.getCurrentWatermarkMs() + 1))
              }
            } else {
              cur.foreach(s => out += Session(userId, s.n, new Timestamp(s.start),
                new Timestamp(s.last), s.total))
              state.remove()
            }
            out.result().iterator
          }
        })
  }
}
