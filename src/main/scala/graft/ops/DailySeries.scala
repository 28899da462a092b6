package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Daily-count time-series analytics shared between the registry queries
  * and the streaming monitors: the SAME expressions serve both paths, so
  * the streaming reports inherit the oracle-checked semantics (the
  * [[graft.streaming.PostingsStream]]/[[Bm25]] and
  * [[graft.streaming.HoltStream]]/[[Forecast]] discipline). Every input
  * is a (day: DATE, n: BIGINT) daily aggregate — |days| rows, so all
  * windows below are aggregate-bounded (Rule-1-safe at any corpus
  * size); the corpus itself is never touched here.
  */
object DailySeries {

  /** x143 contract — binary segmentation's first split (AMOC): the day
    * boundary maximizing the between-segment sum of squares, scored
    * from integer prefix sums; argmax by (bss, earliest day) via
    * max(struct). Returns (split_day, n_days_left, n_days_right,
    * mean_left, mean_right, bss); EMPTY on a <2-day series (parity with
    * the oracle's LIMIT 1 over zero candidates). */
  def changepoint(daily: DataFrame): DataFrame = {
    val W = Window
    val wc = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    // window rides INSIDE the checkpoint (the x128 discipline: the
    // aggregate stays below the window for the plan gate, and the one
    // upstream scan feeds both p's prefix sums and tot's totals)
    val p = daily.withColumn("cums", sum(col("n")).over(wc))
      .withColumn("k", row_number().over(W.orderBy("day")).cast("long"))
      .localCheckpoint()
    val tot = p.agg(sum(col("n")).as("ts_"), count(lit(1)).as("nd"))
    val cand = p.crossJoin(broadcast(tot))
      .filter(col("k") < col("nd"))
      .select(col("day"), col("k").as("nl"), (col("nd") - col("k")).as("nr"),
        col("cums").as("sl"), (col("ts_") - col("cums")).as("sr"),
        (col("ts_").cast("double") / col("nd")).as("mu"))
      .select(col("day"), col("nl"), col("nr"),
        (col("sl").cast("double") / col("nl")).as("ml"),
        (col("sr").cast("double") / col("nr")).as("mr"), col("mu"))
      .select(col("day"), col("nl"), col("nr"), col("ml"), col("mr"),
        (col("nl") * (col("ml") - col("mu")) * (col("ml") - col("mu")) +
          col("nr") * (col("mr") - col("mu")) * (col("mr") - col("mu")))
          .as("bss"))
    cand.agg(max(struct(col("bss"),
        (-datediff(col("day"), lit("1970-01-01"))).as("nd"),
        col("nl"), col("nr"), col("ml"), col("mr"))).as("m"))
      // agg-on-empty yields one all-NULL row where the oracle's
      // LIMIT 1 yields none (single-day series) — drop it
      .filter(col("m.nd").isNotNull)
      .select(date_add(lit("1970-01-01"), -col("m.nd")).as("split_day"),
        col("m.nl").as("n_days_left"), col("m.nr").as("n_days_right"),
        round(col("m.ml"), 6).as("mean_left"),
        round(col("m.mr"), 6).as("mean_right"),
        round(col("m.bss"), 6).as("bss"))
      .orderBy("split_day")
  }

  /** x146 contract — seasonal-naive forecast eval with MASE (Hyndman &
    * Koehler 2006): last-14-day holdout forecast "same weekday last
    * week", priced against the training seasonal-naive MAE. Lag via
    * self equi-join on day−7; integer |errors|. Returns one row
    * (n_train, n_test, naive_mae_train, mae_test, mase). Caller
    * should pass a checkpointed `daily` if it is expensive to
    * recompute (it is consumed twice: lag join + cut). */
  def maseForecast(daily: DataFrame): DataFrame = {
    val cut = daily.agg(date_sub(max(col("day")), 14).as("cut"))
    val lag = daily.select(col("day"), col("n")).as("a")
      .join(daily.select(expr("date_add(day, 7)").as("day"),
        col("n").as("n_lag")).as("b"), "day")
      .crossJoin(broadcast(cut))
      .select(col("day"), abs(col("n") - col("n_lag")).as("ae"),
        (col("day") > col("cut")).as("is_test"))
    lag.agg(
        sum(when(!col("is_test"), 1L).otherwise(0L)).as("n_train"),
        sum(when(col("is_test"), 1L).otherwise(0L)).as("n_test"),
        sum(when(!col("is_test"), col("ae")).otherwise(0L)).as("sa_train"),
        sum(when(col("is_test"), col("ae")).otherwise(0L)).as("sa_test"))
      .select(col("n_train"), col("n_test"),
        // 8-21-day series lag to all-test rows (n_train = 0): 0.0/0 is
        // NaN, not an ANSI crash — NULL-guard the empty side explicitly
        // so NaN never leaks (e.g. into MonitorStream.reportMase state
        // windows); same guard on an all-train window's mae_test
        when(col("n_train") === 0, lit(null).cast("double"))
          .otherwise(round(col("sa_train").cast("double") / col("n_train"), 6))
          .as("naive_mae_train"),
        when(col("n_test") === 0, lit(null).cast("double"))
          .otherwise(round(col("sa_test").cast("double") / col("n_test"), 6))
          .as("mae_test"),
        // a perfectly seasonal training window has MAE 0: NULL, not a
        // DIVIDE_BY_ZERO crash under ANSI mode (oracle mirrors the CASE)
        when(col("n_train") === 0 || col("n_test") === 0 ||
            col("sa_train") === 0, lit(null).cast("double"))
          .otherwise(round((col("sa_test").cast("double") / col("n_test")) /
            (col("sa_train").cast("double") / col("n_train")), 6))
          .as("mase"))
      .orderBy("n_train")
  }
}
