package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.TextFunctions

class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  test("feature count = unigrams + bigrams; empty text scores zero") {
    val df = Seq((1L, "a b c"), (2L, ""), (3L, "solo")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        QualityModel.scoreUdf(4096L)(TextFunctions.tokens(col("text"))).as("sc"))
      .select(col("doc_id"), col("sc.n_feats"), col("sc.margin"))
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    assert(out(0)._2 === 5L) // 3 unigrams + 2 bigrams
    assert(out(1)._2 === 0L && out(1)._3 === 0L)
    assert(out(2)._2 === 1L)
  }

  test("margin replays by hand from poly31 buckets") {
    val toks = Seq("a", "b")
    val feats = Seq("a", "a b", "b")
    val expected = feats.map { f =>
      val b = Dedup.poly31(f) % 4096L
      ((b * 2654435761L) % 1048576L) - 524288L
    }.sum
    val out = Seq((1L, "a b")).toDF("doc_id", "text")
      .select(QualityModel.scoreUdf(4096L)(TextFunctions.tokens(col("text"))).as("sc"))
      .select(col("sc.margin")).as[Long].head()
    assert(out === expected)
  }

  test("score is order-stable: same doc on any partitioning") {
    val text = (1 to 50).map(i => s"tok$i").mkString(" ")
    val df = Seq.tabulate(8)(i => (i.toLong, text)).toDF("doc_id", "text")
    val margins = df.repartition(5)
      .select(QualityModel.scoreUdf(4096L)(TextFunctions.tokens(col("text"))).as("sc"))
      .select(col("sc.margin")).as[Long].collect()
    assert(margins.toSet.size === 1)
  }

  private def kappaOf(rows: Seq[(String, Long, Long)]): Map[String, (Long, Double, Double, Double)] =
    QualityModel.cohenKappa(rows.toDF("grp", "la", "lb"), "grp", "la", "lb")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap

  test("cohenKappa: perfect agreement is 1, textbook 2x2 matches by hand") {
    val perfect = (1 to 10).map(i => ("p", (i % 2).toLong, (i % 2).toLong))
    assert(kappaOf(perfect)("p") === ((10L, 1.0, 0.5, 1.0)))

    // Cohen's own worked shape: a=20 both-yes, d=15 both-no, b=10, c=5
    // po = 35/50 = 0.7, pe = (30/50)(25/50) + (20/50)(25/50) = 0.5
    // kappa = (0.7 - 0.5) / 0.5 = 0.4
    val cells = Seq.fill(20)(("c", 1L, 1L)) ++ Seq.fill(10)(("c", 1L, 0L)) ++
      Seq.fill(5)(("c", 0L, 1L)) ++ Seq.fill(15)(("c", 0L, 0L))
    assert(kappaOf(cells)("c") === ((50L, 0.7, 0.5, 0.4)))
  }

  test("cohenKappa: degenerate constant-equal labelers report 0, not NaN") {
    val const = Seq.fill(7)(("k", 1L, 1L))
    val (n, po, pe, kappa) = kappaOf(const)("k")
    assert(n === 7L && po === 1.0 && pe === 1.0 && kappa === 0.0)
  }

  test("cohenKappa: anti-correlated labelers go negative") {
    val anti = (1 to 10).map(i => ("a", (i % 2).toLong, ((i + 1) % 2).toLong))
    assert(kappaOf(anti)("a")._4 === -1.0)
  }

  // linearly separable toy set: y = 1 iff first feature positive
  private def sepRows = {
    import spark.implicits._
    Seq((1.0, Seq(2.0f, 0.5f)), (1.0, Seq(1.5f, -0.5f)),
      (1.0, Seq(3.0f, 0.0f)), (0.0, Seq(-2.0f, 0.5f)),
      (0.0, Seq(-1.0f, -0.5f)), (0.0, Seq(-2.5f, 0.0f)))
      .toDF("y", "emb")
  }

  test("trainLogReg: weights move toward the separating direction") {
    val w = QualityModel.trainLogReg(sepRows, nDims = 2, steps = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w.keySet === Set(0L, 1L, 2L))
    assert(w(1L) > 0.3, s"dim-1 weight should be clearly positive, got ${w(1L)}")
    assert(math.abs(w(2L)) < w(1L), "uninformative dim stays smaller")
  }

  test("trainLogReg: each step strictly lowers training log-loss") {
    def logLoss(w: Map[Long, Double]): Double = {
      val rows = Seq((1.0, Seq(2.0, 0.5)), (1.0, Seq(1.5, -0.5)),
        (1.0, Seq(3.0, 0.0)), (0.0, Seq(-2.0, 0.5)),
        (0.0, Seq(-1.0, -0.5)), (0.0, Seq(-2.5, 0.0)))
      rows.map { case (y, x) =>
        val m = w(0L) + x.zipWithIndex.map { case (v, i) => v * w(i + 1L) }.sum
        val p = 1.0 / (1.0 + math.exp(-m))
        -(y * math.log(p) + (1 - y) * math.log(1 - p))
      }.sum / rows.size
    }
    val losses = (1 to 3).map { k =>
      val w = QualityModel.trainLogReg(sepRows, nDims = 2, steps = k)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      logLoss(w)
    }
    assert(losses(1) < losses(0) && losses(2) < losses(1),
      s"log-loss should fall monotonically, got $losses")
    assert(losses(0) < logLoss(Map(0L -> 0.0, 1L -> 0.0, 2L -> 0.0)),
      "first step already beats zero weights")
  }

  test("trainLogReg: deterministic under repartitioning") {
    val a = QualityModel.trainLogReg(sepRows, nDims = 2, steps = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    val b = QualityModel.trainLogReg(sepRows.repartition(7), nDims = 2, steps = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    assert(a.sameElements(b))
  }
}
