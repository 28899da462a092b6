package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequential time-series recurrences distributed the only scale-correct
  * way: the raw corpus reduces FIRST to an aggregate-bounded per-key
  * series (map-side-combined counts), and the inherently serial recurrence
  * then folds that bounded array inside one aggregate HOF — the serial
  * part never touches a corpus-sized input.
  */
object Forecast {

  /** Holt linear-trend exponential smoothing (Holt 1957) over a per-key
    * daily series: α = 0.5, β = 0.3, l₁ = y₁, b₁ = 0, SSE accumulating
    * the squared one-step-ahead residuals.
    *
    * Input: (key, day, y) — one row per key×day, y numeric. Output one
    * row per key: (key, n_days, level, trend, forecast, sse), doubles
    * rounded to 6 dp at emission only; the fold itself is pure IEEE +/×
    * in one fixed order, bit-identical on any engine (x122's oracle
    * replays it as a recursive CTE). */
  def holt(daily: DataFrame, key: String): DataFrame =
    daily.groupBy(key)
      .agg(sort_array(collect_list(struct(col("day"), col("y"))))
        .as("sd"))
      .select(col(key),
        size(col("sd")).cast("long").as("n_days"),
        expr("""aggregate(
            |  slice(transform(sd, x -> CAST(x.y AS DOUBLE)), 2, size(sd) - 1),
            |  named_struct('l', CAST(sd[0].y AS DOUBLE),
            |               'b', CAST(0.0 AS DOUBLE),
            |               'sse', CAST(0.0 AS DOUBLE)),
            |  (acc, y) -> named_struct(
            |    'l', 0.5D * y + 0.5D * (acc.l + acc.b),
            |    'b', 0.3D * (0.5D * y + 0.5D * (acc.l + acc.b) - acc.l)
            |         + 0.7D * acc.b,
            |    'sse', acc.sse + (y - (acc.l + acc.b)) * (y - (acc.l + acc.b))))
            |""".stripMargin).as("st"))
      .select(col(key), col("n_days"),
        round(col("st.l"), 6).as("level"),
        round(col("st.b"), 6).as("trend"),
        round(col("st.l") + col("st.b"), 6).as("forecast"),
        round(col("st.sse"), 6).as("sse"))
}
