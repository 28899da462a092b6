package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CmsSketchSpec extends SparkSpec {
  import spark.implicits._

  test("CMS estimate is exact with no collisions and never under-counts") {
    val hashes = Seq.fill(10)(7L) ++ Seq.fill(3)(123456L) ++ Seq(999L)
    val df = hashes.toDF("h")
    val agg = new CmsAggregator(3, 1024)
    val cms = udaf(agg)
    val cells = df.agg(cms(col("h"))).as[Seq[Long]].head().toArray
    assert(CmsSketch.estimate(cells, 7L, 3, 1024) === 10L)
    assert(CmsSketch.estimate(cells, 123456L, 3, 1024) === 3L)
    assert(CmsSketch.estimate(cells, 999L, 3, 1024) === 1L)
    // an unseen key can only over-count (>= 0), never negative
    assert(CmsSketch.estimate(cells, 424242L, 3, 1024) >= 0L)
  }

  test("CMS merges associatively: sketch(a ++ b) == merge(sketch(a), sketch(b))") {
    val a = Seq(1L, 2L, 3L, 1L)
    val b = Seq(1L, 4L, 4L)
    val agg = new CmsAggregator(3, 64)
    def build(xs: Seq[Long]) =
      xs.foldLeft(agg.zero)((buf, h) => agg.reduce(buf, h))
    val merged = agg.merge(build(a), build(b))
    val whole = build(a ++ b)
    assert(merged.toSeq === whole.toSeq)
    assert(CmsSketch.estimate(merged, 1L, 3, 64) >= 3L)
  }

  test("CMS is partition-invariant through Spark aggregation") {
    val hashes = (1L to 500L).map(i => i % 37)
    val agg = new CmsAggregator(3, 64)
    val cms = udaf(agg)
    val one = hashes.toDF("h").coalesce(1).agg(cms(col("h")))
      .as[Seq[Long]].head()
    val many = hashes.toDF("h").repartition(8).agg(cms(col("h")))
      .as[Seq[Long]].head()
    assert(one === many)
  }

  test("over-estimation appears when width is saturated, min-row helps") {
    // 100 distinct keys into width 8: collisions guaranteed in every row
    val hashes = (0L until 100L).flatMap(k => Seq.fill(3)(k * 1009L + 17L))
    val agg = new CmsAggregator(3, 8)
    val cms = udaf(agg)
    val cells = hashes.toDF("h").agg(cms(col("h"))).as[Seq[Long]].head().toArray
    val ests = (0L until 100L).map(k => CmsSketch.estimate(cells, k * 1009L + 17L, 3, 8))
    assert(ests.forall(_ >= 3L)) // never under the true count
    assert(ests.exists(_ > 3L))  // and width-8 must over-count somewhere
  }
}
