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
}
