package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rolling active-user accounting over a distinct (user_id, day) frame —
  * the single definition behind the x163 registry query, x169's exact
  * ground-truth column, and [[graft.streaming.WauStream]]'s report (three
  * call sites; WauStreamSpec asserts their equivalence, so the logic must
  * not fork).
  *
  * The naive form is a per-day COUNT(DISTINCT user) over a sliding range
  * — a corpus-rescan per day; this inverts it: each (user, active-day)
  * row contributes to the ≤`window` trailing windows that contain it (a
  * slim ×window fan-out), one (user, window-day) dedup, one count per
  * window-day — two shuffles of slim pairs total, no window function,
  * emitted only for days that exist in the data. */
object Wau {

  /** (wday, wau): trailing `window`-day distinct actives per existing
    * day. `ud` must be distinct (user_id, day). */
  def windowActive(ud: DataFrame, window: Int = 7): DataFrame = {
    val contrib = ud
      .select(col("user_id"), col("day"),
        explode(sequence(lit(0), lit(window - 1))).as("off"))
      .select(col("user_id"), expr("date_add(day, off)").as("wday"))
      .distinct()
    val days = ud.select(col("day").as("wday")).distinct()
    contrib.join(days, "wday")
      .groupBy("wday").agg(count(lit(1)).as("wau"))
  }

  /** The full x163 output contract: (day, dau, wau, stickiness). */
  def rollingReport(ud: DataFrame, window: Int = 7): DataFrame = {
    val wau = windowActive(ud, window)
    val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
    dau.join(wau, col("day") === col("wday"))
      .select(col("day"), col("dau"), col("wau"),
        round(col("dau").cast("double") / col("wau"), 6).as("stickiness"))
      .orderBy("day")
  }
}
