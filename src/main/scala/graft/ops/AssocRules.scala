package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Association-rule mining over (basket, item) contexts (Agrawal &
  * Srikant, VLDB 1994 — Apriori's rule stage): the single definition
  * behind the x162 registry query and
  * [[graft.streaming.BasketStream]]'s report, so the rule algebra cannot
  * fork between the batch and streaming paths.
  *
  * Shape: one basket-bounded self-join for pair supports, two slim
  * item-keyed joins, a 1-row basket-count broadcast, TakeOrdered top-k.
  * Confidence/lift numerator products run in DOUBLE (sup·sup overflows
  * int64 at real basket cardinalities — the x152 lesson). */
object AssocRules {

  /** Same-basket item pairs (ia < ib) with co-occurrence count `w`,
    * kept when w >= minW — THE single pair builder: the graph ops'
    * `itemPairs`/`itemEdges` (via ExtensionQueries.itemPairsFrom) and
    * the rule miner below both delegate here, so same-basket pair
    * semantics cannot fork between the graph and rules paths. */
  def basketPairs(ctx: DataFrame, minW: Int): DataFrame =
    ctx.as("a").join(ctx.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.day") === col("b.day") && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("ia"), col("b.item").as("ib"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= minW)

  /** Rules over a distinct (user_id, day, item) context frame with
    * non-null items — pass a localCheckpoint'd frame: it is consumed
    * four times (basket count, item supports, both self-join sides).
    * Returns the top-`k` (ante, cons, sup_ab, confidence, lift). */
  def rules(ctx: DataFrame, minSup: Int, k: Int = 20): DataFrame = {
    val nB = ctx.select("user_id", "day").distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val supI = ctx.groupBy("item").agg(count(lit(1)).as("sup"))
    val pairs = basketPairs(ctx, minSup).withColumnRenamed("w", "sup_ab")
    val both = pairs
      .select(col("ia").as("ante"), col("ib").as("cons"), col("sup_ab"))
      .union(pairs.select(col("ib").as("ante"), col("ia").as("cons"),
        col("sup_ab")))
    both
      .join(supI.select(col("item").as("ante"), col("sup").as("sup_a")),
        "ante")
      .join(supI.select(col("item").as("cons"), col("sup").as("sup_c")),
        "cons")
      .crossJoin(broadcast(nB))
      .select(col("ante"), col("cons"), col("sup_ab"),
        round(col("sup_ab").cast("double") / col("sup_a"), 6)
          .as("confidence"),
        round(col("sup_ab").cast("double") * col("n_baskets") /
          (col("sup_a").cast("double") * col("sup_c")), 6).as("lift"))
      .orderBy(col("lift").desc, col("ante"), col("cons")).limit(k)
  }
}
