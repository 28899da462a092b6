package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Schuster periodogram core (Schuster 1898; Fisher 1929 for the
  * relative-power read), shared by registry query x308 and the
  * [[graft.streaming.PeriodogramStream]] twin so both paths carry the
  * same oracle-checked semantics — the [[CusumChart]]/[[EwmaChart]]
  * sharing contract.
  *
  * Determinism: the angle reduces to 2π(t mod P)/P before cos/sin
  * (identical small-argument doubles in both engines), trig values round
  * at 10 dp, products at 6 into DECIMAL sums. The corpus collapses to the
  * calendar-bounded day grid before any trig; the (day × period) lattice
  * is |days|·7 rows of row-local math.
  */
object Periodogram {

  /** Tested period grid (days). */
  val Periods: Seq[Long] = Seq(2L, 3L, 5L, 7L, 10L, 14L, 30L)

  /** Power spectrum from observed (day, n) daily counts. Output:
    * (period, n_days, power, rel_power) — the exact x308 contract. */
  def fromCounts(counts: DataFrame): DataFrame = {
    val d = counts
      .select(expr("datediff(day, DATE '1970-01-01')").cast("long")
        .as("t"), col("n"))
    val m = d.agg(count(lit(1)).as("nd"), sum(col("n")).as("sn"))
      .select(col("nd"),
        round(col("sn").cast("double") / col("nd"), 6).as("mu"))
    val grid = d.crossJoin(broadcast(m))
      .select(col("t"), col("nd"),
        round(col("n") - col("mu"), 6).as("dev"),
        explode(array(Periods.map(lit): _*)).as("p"))
      .select(col("p"), col("nd"), col("dev"),
        (lit(6.283185307179586) * (col("t") % col("p")).cast("double") /
          col("p").cast("double")).as("ang"))
    val pw = grid
      .select(col("p"), col("nd"),
        round(col("dev") * round(cos(col("ang")), 10), 6)
          .cast("decimal(18,6)").as("cterm"),
        round(col("dev") * round(sin(col("ang")), 10), 6)
          .cast("decimal(18,6)").as("sterm"))
      .groupBy("p")
      .agg(max(col("nd")).as("n_days"),
        sum(col("cterm")).cast("double").as("cs"),
        sum(col("sterm")).cast("double").as("ss"))
      .select(col("p").as("period"), col("n_days"),
        round((col("cs") * col("cs") + col("ss") * col("ss")) /
          col("n_days"), 4).as("power"))
    val tot = pw.agg(sum(col("power").cast("decimal(18,4)"))
      .cast("double").as("tp"))
    pw.crossJoin(broadcast(tot))
      .select(col("period"), col("n_days"), col("power"),
        round(col("power") / col("tp"), 6).as("rel_power"))
      .orderBy("period")
  }
}
