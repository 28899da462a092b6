package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Half-life decayed popularity — the x175 scoring contract, shared
  * between the registry query and [[graft.streaming.DecayStream]] so the
  * batch and streaming paths cannot drift (the AssocRules/DailySeries
  * one-definition discipline). Input is (item, day, cnt) cells at ANY
  * partial aggregation level: the core re-sums to the (item, day) grain
  * first, so streaming batch partials compose exactly. */
object Decay {

  /** Score Σ cnt·2^(−age/halfLife) per item against the corpus's newest
    * day, contrast decayed vs raw-count ranks, keep the top `topK`.
    * One decay term per (item, day) cell — never per event; terms are
    * rounded-6 and DECIMAL-summed (engine add-order-proof). */
  def decayedPopularity(cells: DataFrame, halfLifeDays: Double = 7.0,
      topK: Int = 10): DataFrame = {
    val grain = cells.groupBy("item", "day").agg(sum(col("cnt")).as("cnt"))
    val mx = grain.agg(max(col("day")).as("mxd"))
    val aged = grain.crossJoin(broadcast(mx))
      .select(col("item"), col("cnt"),
        datediff(col("mxd"), col("day")).as("age"))
    val scored = aged.groupBy("item")
      .agg(sum(col("cnt")).as("n_events"),
        sum(round(col("cnt") *
            pow(lit(0.5), col("age").cast("double") / halfLifeDays), 6)
          .cast("decimal(18,6)")).cast("double").as("sc"))
    val wRaw = Window.orderBy(col("n_events").desc, col("item"))
    val wDec = Window.orderBy(col("sc").desc, col("item"))
    scored
      .withColumn("raw_rank", row_number().over(wRaw).cast("long"))
      .withColumn("hot_rank", row_number().over(wDec).cast("long"))
      .filter(col("hot_rank") <= topK)
      .select(col("hot_rank"), col("item"), col("n_events"),
        round(col("sc"), 6).as("decayed_score"), col("raw_rank"))
      .orderBy("hot_rank")
  }
}
