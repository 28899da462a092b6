package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SCD-2 dimension maintenance — the incremental twin of
  * [[graft.ops.Relational.scd2History]] (registry x108) and the classic
  * stream→table duality: the stream emits an APPEND-ONLY feed of
  * version-open rows (one per surviving attribute change), and the SCD-2
  * history table is a deterministic view over it — `valid_to` is
  * lead(valid_from) per key, `is_current` marks the last version. Closing
  * a version retroactively (the part an append stream cannot do) is thereby
  * moved OUT of the stream into the view, so the emitted feed is monotone
  * and exactly-once-friendly.
  *
  * Per-key state is three scalars (last state, last change-feed position,
  * next version) regardless of history length. Delivery contract: per-key
  * event-time order across micro-batches (the change feed's natural order);
  * anything at or behind the last applied (ts, event_id) is DROPPED as
  * late — which also makes re-delivery of an already-applied micro-batch a
  * no-op (proven in Scd2StreamSpec) instead of a version fork.
  *
  * Scale shape: one shuffle on the dimension key per micro-batch (the
  * groupByKey), state-store-resident scalars per key, no window over
  * history. Batch input runs the identical code path (state starts empty,
  * NoTimeout) — how stream == batch is proven.
  */
object Scd2Stream {

  final case class Change(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String)
  final case class VersionOpen(user_id: Long, version: Long, state: String,
      valid_from: Timestamp)
  // public: the streaming state encoder's generated code instantiates it
  // reflectively (a private nested case class fails Janino compilation)
  final case class Scd2KeyState(lastState: String, lastMicros: Long,
      lastEventId: Long, nextVersion: Long)

  private def micros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  /** The version-open feed: one row per surviving state change, in per-key
    * (ts, event_id) order. Works identically on batch and streaming input. */
  def versionOpens(spark: SparkSession, changes: Dataset[Change],
      watermarkDelay: String = "1 hour"): Dataset[VersionOpen] = {
    import spark.implicits._
    val src =
      if (changes.isStreaming) changes.withWatermark("ts", watermarkDelay)
      else changes
    src
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uid: Long, it: Iterator[Change], state: GroupState[Scd2KeyState]) => {
          val sorted = it.toSeq
            .sortBy(e => (micros(e.ts), e.event_id))
          val out = Seq.newBuilder[VersionOpen]
          var cur = state.getOption
          sorted.foreach { e =>
            val pos = (micros(e.ts), e.event_id)
            val fresh = cur.forall(s =>
              pos._1 > s.lastMicros ||
                (pos._1 == s.lastMicros && pos._2 > s.lastEventId))
            if (fresh) {
              val changed = cur.forall(_.lastState != e.event_type)
              if (changed) {
                val v = cur.map(_.nextVersion).getOrElse(1L)
                out += VersionOpen(uid, v, e.event_type, e.ts)
                cur = Some(Scd2KeyState(e.event_type, pos._1, pos._2, v + 1))
              } else {
                // same state: advances the late-guard position only
                cur = cur.map(_.copy(lastMicros = pos._1, lastEventId = pos._2))
              }
            } // else: late or re-delivered — already applied, drop
          }
          cur.foreach(state.update)
          out.result().iterator
        })
  }

  /** The SCD-2 history table as a view over the accumulated version-open
    * feed: valid_to = next version's valid_from per key (NULL while
    * current). Column-compatible with registry x108's output. */
  def historyView(opens: Dataset[VersionOpen]): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("version"))
    opens.toDF()
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .withColumn("is_current",
        when(col("valid_to").isNull, 1L).otherwise(0L))
      .select(col("user_id"), col("version"), col("state"),
        col("valid_from"), col("valid_to"), col("is_current"))
  }
}
