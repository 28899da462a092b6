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
}
