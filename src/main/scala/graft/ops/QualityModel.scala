package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hashed linear text scorer — the fastText shape (Joulin et al. 2016,
  * public): features are unigrams + bigrams hashed into `dim` buckets, the
  * score is the mean bucket weight, classification is a sign test. The
  * heavy part of quality classification at 100 TB is exactly this kernel:
  * row-local, compiled, zero shuffle, weights broadcast (here derived
  * deterministically from the bucket id so the whole model — hashing AND
  * weights — replays in integer SQL; a trained model would ship the same
  * shape as a broadcast float array).
  *
  * All accumulation is integer: bucket b = poly31(feat) mod dim, weight
  * w_b = ((b · 2654435761) mod 2^20) − 2^19, margin = Σ_features w_b.
  * The only floating-point step is the final score division
  * margin / (n_feats · 2^20) — one division of exact integers.
  */
object QualityModel {

  /** Per-bucket weight: a multiplicative-hash spread over ±2^19. */
  private[ops] def weight(bucket: Long): Long =
    ((bucket * 2654435761L) % 1048576L) - 524288L

  final case class Scored(n_feats: Long, margin: Long)

  /** (feature count, integer margin) of a document under the hashed linear
    * model. Features: every token occurrence + every adjacent-pair
    * occurrence (counts, not distinct — a bag-of-ngrams model). */
  def scoreUdf(dim: Long) = udf { toks: Seq[String] =>
    var n = 0L
    var margin = 0L
    def add(f: String): Unit = {
      val b = Dedup.poly31(f) % dim // poly31 is non-negative by construction
      margin += weight(b)
      n += 1
    }
    var i = 0
    while (i < toks.length) {
      add(toks(i))
      if (i + 1 < toks.length) add(toks(i) + " " + toks(i + 1))
      i += 1
    }
    Scored(n, margin)
  }

  /** Cohen's kappa (Cohen 1960) between two binary labelers, per group —
    * the inter-annotator-agreement gate a labeled-data pipeline runs
    * before trusting its labels. Input needs the two 0/1 label columns
    * and a group column already computed (so the labelers themselves stay
    * caller-defined).
    *
    * po = observed agreement, pe = chance agreement from the marginals,
    * kappa = (po − pe) / (1 − pe); the degenerate pe = 1 group (both
    * labelers constant and equal) reports kappa = 0 by convention.
    *
    * Scale shape: one groupBy over the group key with four conditional
    * sums — a single map-side-combined shuffle of |groups| rows; all
    * arithmetic afterward is row-local on the aggregate row. Every
    * double op is written in one fixed order so a SQL twin replays it
    * bit-for-bit. */
  def cohenKappa(labeled: DataFrame, group: String, labelA: String,
      labelB: String): DataFrame = {
    val g = labeled.groupBy(col(group))
      .agg(count(lit(1)).as("n"),
        sum(col(labelA)).as("na"),
        sum(col(labelB)).as("nb"),
        sum(when(col(labelA) === col(labelB), 1L).otherwise(0L)).as("agree"))
    val po = col("agree").cast("double") / col("n")
    val pa = col("na").cast("double") / col("n")
    val pb = col("nb").cast("double") / col("n")
    val pe = pa * pb + (lit(1.0) - pa) * (lit(1.0) - pb)
    g.select(col(group), col("n").cast("long").as("n"),
        round(po, 6).as("po"), round(pe, 6).as("pe"),
        round(when(pe === 1.0, 0.0).otherwise((po - pe) / (lit(1.0) - pe)), 6)
          .as("kappa"))
  }

  /** One full-batch logistic-regression gradient step (lr = 1) over rows
    * of (y: DOUBLE 0/1, emb: ARRAY of numerics) given weights `w` (bias
    * at index 0, then one weight per dimension). Returns the updated
    * weights as a (dim, w) DataFrame of `w.length` rows.
    *
    * Distributed-GD shape: weights enter the plan as LITERALS (broadcast
    * by the closure, no join), the margin is one zip_with/aggregate fold
    * per row, the gradient is a posexplode into a |dims|+1-group
    * aggregate with map-side partials — per-task output is |dims|+1 rows
    * regardless of corpus size. Determinism: per-row contributions round
    * to 6 dp and sum as DECIMAL(18,6) (exact, associative); margin,
    * sigmoid, gradient and update each round to 6 dp IN SPARK, so an SQL
    * twin replays the identical value sequence. Nothing decimal leaves. */
  def logRegStep(rows: DataFrame, w: Array[Double]): DataFrame = {
    val wDims = array(w.drop(1).map(lit): _*)
    val wAll = array(w.map(lit): _*)
    val m = round(
      lit(w(0)) + aggregate(
        zip_with(col("emb"), wDims, (x, wi) => x * wi),
        lit(0.0), (acc, v) => acc + v), 6)
    rows.select(col("y"), col("emb"),
        round(lit(1.0) / (lit(1.0) + exp(-m)), 6).as("p"))
      .select((col("p") - col("y")).as("err"),
        posexplode(concat(array(lit(1.0)), col("emb"))))
      .select(col("pos").cast("long").as("dim"),
        round(col("err") * col("col"), 6).cast("decimal(18,6)").as("c"))
      .groupBy("dim")
      .agg(sum(col("c")).as("gs"), count(lit(1)).as("n"))
      .select(col("dim"),
        round(element_at(wAll, (col("dim") + 1).cast("int")) -
          round(col("gs").cast("double") / col("n"), 6), 6).as("w"))
  }

  /** `steps` full-batch GD steps from zero weights; the first `steps − 1`
    * collect |dims|+1 weights to the driver (k-sized by construction),
    * the returned DataFrame is the final step, fully lazy. */
  def trainLogReg(rows: DataFrame, nDims: Int, steps: Int): DataFrame = {
    var w = Array.fill(nDims + 1)(0.0)
    for (_ <- 1 until steps)
      w = logRegStep(rows, w).collect()
        .map(r => r.getLong(0).toInt -> r.getDouble(1))
        .sortBy(_._1).map(_._2)
    logRegStep(rows, w)
  }
}
