package graft.ops

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Contracts for the KNN-Shapley valuation kernel (Jia et al. 2019):
  * a hand-computed closed-form tiny case (the N <= K additive regime,
  * where every point is worth exactly m/K) and the Shapley EFFICIENCY
  * axiom on real data (Σ_i s_i = v(full train set) per probe) — the
  * axiom is what makes the recursion trustworthy end-to-end, since any
  * mistake in the base term, the min(K,i)/i factor, or the suffix-sum
  * direction breaks it. */
class ValuationSpec extends SparkSpec {

  test("N <= K additive regime: every point is worth exactly m/K") {
    import spark.implicits._
    // One probe with label 0; three train points whose cosine ordering to
    // the probe is forced by construction (descending first component).
    val probe = Seq((100L, Array(1f, 0f, 0f, 0f), 0))
      .toDF("qid", "qemb", "qlab")
    val train = Seq(
      (1L, Array(1f, 0.1f, 0f, 0f), 0),   // most similar, matching label
      (2L, Array(1f, 0.8f, 0f, 0f), 1),   // middle, mismatched
      (3L, Array(0.1f, 1f, 0f, 0f), 0))   // least similar, matching
      .toDF("vec_id", "embedding", "label")
    val out = Valuation
      .knnShapley(train, probe, "vec_id", "embedding", "label", k = 5)
      .orderBy("tid")
      .select("tid", "shap").as[(Long, Double)].collect()
    // v(S) = (1/5)·Σ m_i is additive for |S| <= 5 ⇒ s_i = m_i/5 exactly.
    assert(out.toSeq == Seq((1L, 0.2), (2L, 0.0), (3L, 0.2)))
  }

  test("efficiency axiom on sf data: Σ shap per probe = utility of full set") {
    val e = graft.Tables.embeddings(spark, sfDir)
    val probes = e
      .withColumn("h", md5(concat(lit("shap"), col("vec_id").cast("string"))))
      .orderBy("h", "vec_id").limit(8)
      .select(col("vec_id").as("qid"), col("embedding").as("qemb"),
        col("label").as("qlab"))
    val train = e.join(broadcast(probes.select(col("qid").as("vec_id"))),
      Seq("vec_id"), "left_anti")
    val all = Valuation
      .knnShapley(train, probes, "vec_id", "embedding", "label", k = 5)
      .cache()
    try {
      val sums = all.groupBy("qid").agg(sum(col("shap")).as("total"))
      // v(D) = (1/K)·Σ_{rk <= K} 1[label match]; recover m from shap's
      // inputs: rank <= 5 rows with tlab equal to the probe's label.
      val qlab = probes.select(col("qid"), col("qlab"))
      val util = all.filter(col("rk") <= 5)
        .join(broadcast(qlab), "qid")
        .groupBy("qid")
        .agg((sum(when(col("tlab") === col("qlab"), 1.0).otherwise(0.0)) / 5.0)
          .as("v_full"))
      val joined = sums.join(util, "qid")
        .select(abs(col("total") - col("v_full")).as("gap"))
        .agg(max("gap")).head().getDouble(0)
      // Terms are rounded to 6dp before the decimal suffix sum; s_i's
      // error is Σ_{j>=i} δ_j, so the TOTAL's error is Σ_j j·δ_j — up to
      // ~N²/2·5e-7 in the adversarial case, observed ~1e-3 at N=492.
      // 5e-3 still catches any formula error (wrong base, wrong
      // min(K,i)/i, wrong suffix direction), which shifts the total by
      // O(0.1) — the smallest single term is already 1/N ≈ 2e-3.
      assert(joined < 5e-3, s"efficiency gap $joined")
    } finally all.unpersist()
  }

  test("registry x176 emits 5 ranked rows per probe, shap descending") {
    val df = SparkEntry.queries("x176_knn_shapley")(spark, sfDir)
    val rows = df.collect()
    val perQ = rows.groupBy(_.getLong(0))
    assert(perQ.size == 8 && perQ.values.forall(_.length == 5))
    perQ.values.foreach { rs =>
      val byRank = rs.sortBy(_.getLong(1)).map(_.getDouble(5))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }
}
