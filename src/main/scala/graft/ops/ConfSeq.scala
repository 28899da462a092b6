package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Anytime-valid confidence sequence core (x335; Hoeffding 1963 bound
  * stitched across looks by the union-bound α_t = α/(t(t+1)) device —
  * Σ α_t = α, so coverage holds at every look simultaneously;
  * Howard-Ramdas-McAuliffe-Sekhon 2021 is the modern treatment this
  * approximates from first principles).
  *
  * Shared by the registry query x335 (batch, Extension2Queries) and
  * [[graft.streaming.ConfSeqStream]] (the monitor is INHERENTLY a
  * streaming object — its whole point is optional stopping under
  * continuous observation), so stream == batch == registry verbatim.
  *
  * Input contract: one row per day, `(day: date, n: long, k: long)` —
  * total events and purchase events. Per-day partials form a commutative
  * monoid (micro-batch splits sum to the same table), which is what lets
  * the streaming twin accumulate them idempotently. Output: the x335
  * contract (day, t, n_events, rate, cs_lo, cs_hi, excludes_half,
  * excluded_half_ever), ordered by day. Windows here sit over the
  * calendar-bounded day grid (Rule-1-safe).
  */
object ConfSeq {
  def fromCounts(d: DataFrame): DataFrame = {
    val wc = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    val seq0 = d
      .withColumn("t", row_number().over(Window.orderBy("day"))
        .cast("long"))
      .withColumn("cn", sum(col("n")).over(wc))
      .withColumn("ck", sum(col("k")).over(wc))
      .select(col("day"), col("t"), col("cn"), col("ck"),
        round(col("ck").cast("double") / col("cn"), 6).as("rate"),
        round(sqrt(round(log(lit(2.0) *
          (col("t") * (col("t") + 1)).cast("double") / 0.05), 9) /
          (lit(2.0) * col("cn"))), 6).as("eps"))
      .select(col("day"), col("t"), col("cn").as("n_events"),
        col("rate"),
        round(greatest(col("rate") - col("eps"), lit(0.0)), 6)
          .as("cs_lo"),
        round(least(col("rate") + col("eps"), lit(1.0)), 6)
          .as("cs_hi"),
        ((col("rate") + col("eps") < 0.5) ||
          (col("rate") - col("eps") > 0.5)).cast("long")
          .as("excludes_half"))
    seq0.withColumn("excluded_half_ever",
        max(col("excludes_half")).over(wc))
      .orderBy("day")
  }
}
