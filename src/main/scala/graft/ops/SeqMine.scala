package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequential-pattern mining (PrefixSpan — Pei et al., "PrefixSpan: Mining
  * Sequential Patterns Efficiently by Prefix-Projected Pattern Growth",
  * ICDE 2001, public).
  *
  * The pattern-growth device, distributed: a sequence supports pattern
  * ⟨a₁…aₖ⟩ iff the items appear in order, and greedy earliest matching is
  * complete for subsequence containment — so the per-sequence "projected
  * database" of PrefixSpan collapses to ONE (sequence, prefix, position)
  * row: the position of the prefix's earliest match. Growing a prefix is
  * then a single equi-join on the sequence id against events AFTER that
  * position, and support counting is a groupBy over the grown table (one
  * row per (sequence, pattern) by construction). Candidates never
  * materialize beyond frequent-prefix extensions — the Apriori-style
  * pruning that keeps level k's work proportional to surviving prefixes,
  * not |alphabet|ᵏ.
  *
  * Scale shape: the only window is per-sequence (bounded); every join is
  * equi on the sequence id; per-level state is |sequences|·|frequent
  * prefixes| slim rows (the projected-database size — PrefixSpan's own
  * cost), localCheckpointed so each level is one shuffle over the prior
  * level's output, never a re-scan of the corpus. The support threshold
  * is RELATIVE (a 1-row broadcast of the sequence count), so the same
  * query is meaningful at any corpus size.
  */
object SeqMine {

  /** Frequent event sequences up to `maxLen`, support >= ceil(minSupFrac ·
    * |sequences|). `seqCol` identifies a sequence, `itemCol` the event
    * label, `orderCols` a deterministic within-sequence total order.
    * Returns (pattern, level, support, support_frac) — pattern is the
    * '>'-joined item path. */
  def prefixSpan(events: DataFrame, seqCol: String, itemCol: String,
      orderCols: Seq[Column], minSupFrac: Double, maxLen: Int): DataFrame = {
    val w = Window.partitionBy(col(seqCol)).orderBy(orderCols: _*)
    val ev = events
      .withColumn("__rn", row_number().over(w).cast("long"))
      .select(col(seqCol).as("__sid"), col(itemCol).as("__et"), col("__rn"))
      .localCheckpoint()
    // '>' is the pattern separator and "" the level-0 sentinel: an item
    // containing '>' would make two different same-level paths collide on
    // one pattern string, and an empty item would alias the root. The
    // checkpoint above is already an action, so one bounded aggregate
    // validates the whole alphabet up front instead of corrupting output.
    val bad = ev.agg(
        sum(when(col("__et").isNull || col("__et") === "" ||
          col("__et").contains(">"), 1L).otherwise(0L)).as("n"))
      .head().getLong(0)
    require(bad == 0L,
      s"prefixSpan: $bad item value(s) are NULL/empty or contain the " +
        "pattern separator '>' — escape or filter them first")
    val nu = ev.agg(countDistinct(col("__sid")).as("__nu"))

    // level-0 prefix: every sequence with the empty pattern at position 0
    var prefixes = ev.select(col("__sid")).distinct()
      .select(col("__sid"), lit("").as("__pat"), lit(0L).as("__pos"))
    var out: DataFrame = null
    (1 to maxLen).foreach { k =>
      val grown = prefixes.alias("p")
        .join(ev.alias("e"), col("p.__sid") === col("e.__sid") &&
          col("e.__rn") > col("p.__pos"))
        .select(col("p.__sid").as("__sid"),
          when(col("p.__pat") === "", col("e.__et"))
            .otherwise(concat(col("p.__pat"), lit(">"), col("e.__et")))
            .as("__pat"),
          col("e.__rn").as("__rn"))
        .groupBy("__sid", "__pat").agg(min(col("__rn")).as("__pos"))
        .localCheckpoint() // consumed twice (support count + next level)
      // one row per (sequence, pattern) ⇒ support = plain row count
      val freq = grown.groupBy("__pat").agg(count(lit(1)).as("support"))
        .crossJoin(broadcast(nu))
        .filter(col("support") >= ceil(lit(minSupFrac) * col("__nu")))
      val level = freq.select(col("__pat").as("pattern"),
        lit(k.toLong).as("level"), col("support"),
        round(col("support").cast("double") / col("__nu"), 6)
          .as("support_frac"))
      out = if (out == null) level else out.union(level)
      prefixes = grown.join(freq.select(col("__pat")), "__pat")
        .select(col("__sid"), col("__pat"), col("__pos"))
    }
    out.orderBy("level", "pattern")
  }
}
