package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Roberts 1959 EWMA control chart core (Lucas & Saccucci 1990 for the
  * time-varying limits), shared by registry query x236 and the
  * [[graft.streaming.EwmaStream]] twin so both paths carry the same
  * oracle-checked semantics.
  *
  * The geometric recursion z_t = λ x_t + (1−λ) z_{t−1} is evaluated as a
  * TWO-LEVEL RESCALED SCAN, not a loop: within 16-day blocks z is a
  * prefix sum of terms pre-scaled by 1.25^j (5^15 < 2^53, so the scale
  * factors are exactly representable and never overflow) and post-scaled
  * by 0.8^j; completed blocks contribute a carry that decays as
  * E_k · 0.8^{16(b−1−k)} over the ~|days|/16-row block grid — a bounded
  * broadcast theta-join. Every power goes through round(power(·,·), 10)
  * so a last-ulp libm difference between engines cannot move a 6-dp
  * value, and per-step products are rounded-6 into DECIMAL sums (the
  * x227 trajectory discipline).
  */
object EwmaChart {

  /** Chart from observed (day, n) daily counts; gaps are zero-filled
    * against the observed span HERE, so batch and stream callers agree
    * by construction. Output: (day, n, ewma, control_limit, alarm). */
  def fromCounts(counts: DataFrame): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val span = counts.agg(min(col("day")).as("a"), max(col("day")).as("b"))
    val daily = span
      .select(col("a"), explode(expr("sequence(a, b)")).as("day"))
      .join(counts, Seq("day"), "left").na.fill(0L, Seq("n"))
      .select(col("day"), col("n"),
        datediff(col("day"), col("a")).cast("long").as("idx"))
    val mom = daily.agg(count(lit(1)).as("d"),
        sum(col("n")).as("sn"), sum(col("n") * col("n")).as("snn"))
      .select(
        round(col("sn").cast("double") / col("d"), 6).as("mu"),
        // one-day guard (the CusumChart device): a single observed day
        // (streaming first micro-batch) makes the (d − 1) sample sd
        // degenerate; sigma := 0 keeps the chart well-defined and is
        // bit-identical for every multi-day chart
        when(col("d") > 1,
          round(sqrt((col("snn").cast("double") -
            col("sn").cast("double") * col("sn") / col("d")) /
            (col("d") - 1)), 6)).otherwise(lit(0.0)).as("sigma"))
    val dev = daily.crossJoin(broadcast(mom))
      .withColumn("blk", expr("idx div 16"))
      .withColumn("j", col("idx") % 16)
      .withColumn("term", round(((col("n") - col("mu")) * lit(0.2)) *
        round(pow(lit(1.25), col("j")), 10), 6)
        .cast("decimal(18,6)"))
    val wb = W.partitionBy("blk").orderBy("idx")
      .rowsBetween(W.unboundedPreceding, 0)
    val inb = dev.withColumn("cum", sum(col("term")).over(wb))
      .withColumn("i_t", round(col("cum").cast("double") *
        round(pow(lit(0.8), col("j")), 10), 6))
    val ends = inb.filter(col("j") === 15)
      .select(col("blk").as("k"), col("i_t").as("e"))
    val p = dev.select("blk").distinct()
      .join(broadcast(ends), col("k") < col("blk"))
      .select(col("blk"), round(col("e") *
        round(pow(lit(0.8), (col("blk") - col("k") - 1) * 16), 10), 6)
        .cast("decimal(18,6)").as("pt"))
      .groupBy("blk").agg(sum(col("pt")).as("p"))
    inb.join(broadcast(p), Seq("blk"), "left")
      .withColumn("pv", coalesce(col("p").cast("double"), lit(0.0)))
      .withColumn("ewma", round(col("i_t") +
        round(round(pow(lit(0.8), col("j") + 1), 10) * col("pv"), 6),
        6))
      .withColumn("climit", round(lit(3) * col("sigma") *
        round(sqrt(round(lit(0.2) / lit(1.8) * (lit(1.0) -
          round(pow(lit(0.8), col("idx") * 2 + 2), 10)), 9)), 6), 6))
      .select(col("day"), col("n"), col("ewma"),
        col("climit").as("control_limit"),
        (abs(col("ewma")) > col("climit")).cast("long").as("alarm"))
      .orderBy("day")
  }
}
