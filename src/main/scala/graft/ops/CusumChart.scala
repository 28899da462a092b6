package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Page 1954 tabular CUSUM core (Montgomery SPC ch. 9 for the two-sided
  * form), shared by registry query x227 and the
  * [[graft.streaming.CusumStream]] twin so both paths carry the same
  * oracle-checked semantics — the same sharing contract as
  * [[EwmaChart]]/x236.
  *
  * The recursion S_t = max(0, S_{t-1} + dev_t) is deliberately NOT
  * computed as a loop: S_t = C_t − min(0, min_{τ≤t} C_τ) for prefix sums
  * C — a running min over the calendar-bounded day grid, so the whole
  * trajectory is two windows (aggregate below = Rule-1 escape). μ, σ
  * enter as rounded-6 scalars; allowance k = σ/2, threshold h = 4σ (the
  * standard ARL-motivated tabular choice); per-day deviations round to 6
  * and prefix-sum through DECIMAL(18,6), so the trajectory replays
  * bit-identically across engines.
  */
object CusumChart {

  /** Chart from observed (day, n) daily counts; interior gaps are
    * zero-filled against the observed span HERE, so batch and stream
    * callers agree by construction. Output: (day, n, s_hi, s_lo,
    * alarm) — the exact x227 contract. */
  def fromCounts(counts: DataFrame): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val span = counts.agg(min(col("day")).as("a"), max(col("day")).as("b"))
    val daily = span
      .select(explode(expr("sequence(a, b)")).as("day"))
      .join(counts, Seq("day"), "left").na.fill(0L, Seq("n"))
    val mom = daily.agg(count(lit(1)).as("d"),
        sum(col("n")).as("sn"), sum(col("n") * col("n")).as("snn"))
      .select(
        round(col("sn").cast("double") / col("d"), 6).as("mu"),
        // one-day guard: the sample sd divides by (d − 1), so a chart
        // over a single observed day (a streaming first micro-batch)
        // would carry NaN/null sigma into every s_hi/s_lo/alarm row;
        // sigma := 0 makes the degenerate chart well-defined (dev = 0,
        // no alarm) and leaves every multi-day chart bit-identical
        when(col("d") > 1,
          round(sqrt((col("snn").cast("double") -
            col("sn").cast("double") * col("sn") / col("d")) /
            (col("d") - 1)), 6)).otherwise(lit(0.0)).as("sigma"))
    val wc = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    val dev = daily.crossJoin(broadcast(mom))
      .select(col("day"), col("n"), col("mu"), col("sigma"),
        round(col("n") - col("mu") - col("sigma") / 2, 6)
          .cast("decimal(18,6)").as("dh"),
        round(col("n") - col("mu") + col("sigma") / 2, 6)
          .cast("decimal(18,6)").as("dl"))
      .withColumn("ch", sum(col("dh")).over(wc))
      .withColumn("cl", sum(col("dl")).over(wc))
      .withColumn("mh", min(col("ch")).over(wc))
      .withColumn("ml", max(col("cl")).over(wc))
    dev.select(col("day"), col("n"),
        round((col("ch") - least(col("mh"),
          lit(0).cast("decimal(18,6)"))).cast("double"), 6).as("s_hi"),
        round((greatest(col("ml"), lit(0).cast("decimal(18,6)")) -
          col("cl")).cast("double"), 6).as("s_lo"),
        ((col("ch") - least(col("mh"), lit(0).cast("decimal(18,6)")))
          .cast("double") > col("sigma") * 4 ||
          (greatest(col("ml"), lit(0).cast("decimal(18,6)")) -
            col("cl")).cast("double") > col("sigma") * 4)
          .cast("long").as("alarm"))
      .orderBy("day")
  }
}
