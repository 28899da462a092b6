package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Survival analysis over right-censored durations — the
  * retention/churn-curve estimator (Kaplan & Meier 1958).
  */
object Survival {

  /** Kaplan-Meier product-limit estimator. Input: one row per subject,
    * (t, obs) — duration and 1 if the event was observed / 0 if
    * right-censored. Output: one row per distinct duration,
    * (t, n_at_risk, n_events, n_censored, survival), survival rounded to
    * 6 dp at emission.
    *
    * Scale shape: subjects reduce FIRST to the |distinct t| aggregate
    * (map-side-combined), and both sequential parts run on that bounded
    * table only — at-risk counts via an integer running sum (window over
    * an aggregate, Rule-1-safe) and the survival product via an
    * aggregate-HOF fold over the packed (t, d, c) array (the x122
    * device, O(k²) for k distinct durations). The factor chain is pure
    * IEEE divide/multiply on integer-valued doubles — no transcendentals
    * — so any engine replays it bit-for-bit (x124's oracle does, as a
    * recursive CTE). */
  def kaplanMeier(durations: DataFrame): DataFrame = {
    val agg = durations.groupBy("t")
      .agg(sum(col("obs")).as("d"),
        sum(lit(1L) - col("obs")).as("c"))
    val tot = durations.agg(count(lit(1)).as("n"))
    val packed = agg
      .agg(sort_array(collect_list(struct(col("t"), col("d"), col("c"))))
        .as("arr"))
      .crossJoin(broadcast(tot))
    val wPrior = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    packed
      .select(col("n"), col("arr"), posexplode(col("arr")))
      .select(col("col.t").as("t"), col("col.d").as("d"),
        col("col.c").as("c"), col("pos"), col("n"), col("arr"))
      .withColumn("n_at_risk",
        col("n") - coalesce(sum(col("d") + col("c")).over(wPrior), lit(0L)))
      .withColumn("survival", expr(
        """round(aggregate(slice(arr, 1, pos + 1),
          |  named_struct('rem', CAST(n AS DOUBLE), 's', CAST(1.0 AS DOUBLE)),
          |  (acc, x) -> named_struct(
          |    'rem', acc.rem - x.d - x.c,
          |    's', acc.s * ((acc.rem - x.d) / acc.rem))).s, 6)
          |""".stripMargin))
      .select(col("t"), col("n_at_risk"), col("d").as("n_events"),
        col("c").as("n_censored"), col("survival"))
  }
}
