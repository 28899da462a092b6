package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data valuation kernels.
  *
  * KNN-Shapley (Jia et al., "Efficient Task-Specific Data Valuation for
  * Nearest Neighbor Algorithms", PVLDB 12(11), 2019, Theorem 1): for the
  * unweighted-KNN utility v(S) = (1/K) Σ_{k ≤ min(K,|S|)} 1[y_{α_k(S)} = y],
  * the EXACT Shapley value of every training point has a closed form over
  * the similarity ranking α_1..α_N (most- to least-similar):
  *
  *   s(α_N) = 1[y_{α_N} = y] · min(K,N) / (K·N)
  *   s(α_i) = s(α_{i+1}) + (1[y_{α_i}=y] − 1[y_{α_{i+1}}=y])/K · min(K,i)/i
  *
  * i.e. a suffix sum over the ranking of row-local terms — a window
  * aggregate, no sampling, no retraining. Scale shape: with a BOUNDED probe
  * set the similarity stage is |probes|·N map-side dot products against a
  * broadcast probe frame (the corpus never shuffles); the only shuffle is
  * the per-probe ranking, whose 100 TB form is the two-level bucketed
  * global-rank device (see the x165/x168 countBelow pattern). The suffix
  * accumulation routes each term through round(·,6)→DECIMAL(18,6) so the
  * window sum is exact decimal addition — engine add-order-proof.
  */
object Valuation {

  /** Exact KNN-Shapley value of every `train` row for every probe row.
    *
    * @param train  (idCol, embCol, labelCol) training corpus
    * @param probes (qid, qemb, qlab) bounded probe/validation set; must be
    *               disjoint from `train` (caller enforces)
    * @param k      the K of the KNN utility
    * @return (qid, tid, tlab, sim, rk, shap) — one row per (probe, train)
    *         pair; `shap` is rounded to 6 decimals
    */
  def knnShapley(train: DataFrame, probes: DataFrame, idCol: String,
      embCol: String, labelCol: String, k: Int): DataFrame = {
    val sims = train.crossJoin(broadcast(probes))
      .select(col("qid"), col("qlab"), col(idCol).as("tid"),
        col(labelCol).as("tlab"),
        Similarity.cosine(col(embCol), col("qemb")).as("sim"))
    val wRank = Window.partitionBy("qid").orderBy(col("sim").desc, col("tid"))
    val wAll = Window.partitionBy("qid")
    val wLead = Window.partitionBy("qid").orderBy("rk")
    val wSuffix = Window.partitionBy("qid").orderBy(col("rk").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val kD = lit(k.toDouble)
    val kI = lit(k)
    val ranked = sims
      .withColumn("rk", row_number().over(wRank))
      .withColumn("nn", count(lit(1)).over(wAll))
      .withColumn("m", when(col("tlab") === col("qlab"), 1.0).otherwise(0.0))
    // Base term: the N>K branch is the plain m/N the registry data always
    // takes (oracle mirrors the CASE); the general branch covers N <= K,
    // where the game is additive and every point is worth m/K.
    val baseCol: Column =
      when(col("nn") > kI, col("m") / col("nn"))
        .otherwise(col("m") * least(kI, col("nn")) / (kD * col("nn")))
    ranked
      .withColumn("term",
        when(col("rk") < col("nn"),
          (col("m") - lead(col("m"), 1).over(wLead)) / kD *
            least(kI, col("rk")) / col("rk"))
          .otherwise(lit(0.0)))
      .withColumn("base",
        max(when(col("rk") === col("nn"), baseCol)).over(wAll))
      .withColumn("shap",
        round(col("base") +
          sum(round(col("term"), 6).cast("decimal(18,6)")).over(wSuffix)
            .cast("double"), 6))
      .select(col("qid"), col("tid"), col("tlab"), col("sim"), col("rk"),
        col("shap"))
  }
}
