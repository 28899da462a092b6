package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contracts for the mergeable compactor quantile sketch:
  * exactness below capacity, rank-error bounds on real data (single
  * build AND partitioned tree-merge), exact min/max propagation,
  * bounded state, and bit-determinism of the derandomized compactor. */
class QuantileSketchSpec extends SparkSpec {

  test("n <= k: sketch is exact at every rank") {
    val xs = (1 to 100).map(_.toDouble)
    val sk = QuantileSketch.fromIter(scala.util.Random.shuffle(xs).iterator, 256)
    assert(sk.n == 100 && sk.lo == 1.0 && sk.hi == 100.0)
    // with no compaction, quantile(q) is the ceil(q*n)-th order statistic
    assert(sk.quantile(0.5) == 50.0)
    assert(sk.quantile(0.25) == 25.0)
    assert(sk.quantile(0.99) == 99.0)
  }

  test("rank error <= 2% on events values, single-pass and tree-merged") {
    val ev = graft.Tables.events(spark, sfDir).select(col("value"))
    val exact = ev.select(col("value").cast("double")).collect()
      .map(_.getDouble(0)).sorted
    val n = exact.length.toDouble
    def trueRank(x: Double): Double = {
      // fraction of values <= x via binary search on the sorted array
      var lo = 0; var hi = exact.length
      while (lo < hi) {
        val mid = (lo + hi) / 2
        if (exact(mid) <= x) lo = mid + 1 else hi = mid
      }
      lo / n
    }
    val single = QuantileSketch.fromIter(exact.iterator, 256)
    val merged = QuantileSketch.build(ev.repartition(8), "value", k = 256)
    assert(merged.n == exact.length)
    for (sk <- Seq(single, merged); q <- 1 to 19) {
      val est = sk.quantile(q / 20.0)
      val err = math.abs(trueRank(est) - q / 20.0)
      assert(err <= 0.02, s"rank error $err at q=${q / 20.0}")
    }
    assert(merged.lo == exact.head && merged.hi == exact.last)
  }

  test("merge is size-correct and state stays bounded") {
    val a = QuantileSketch.fromIter((1 to 10000).map(_.toDouble).iterator, 64)
    val b = QuantileSketch.fromIter((5000 to 15000).map(_.toDouble).iterator, 64)
    val m = QuantileSketch.merge(a, b)
    assert(m.n == a.n + b.n)
    // bounded state: <= k items per level, O(log(n/k)) levels
    assert(m.levels.forall(_.length <= 64 * 2))
    assert(m.levels.length <= 16)
    // the merged median sits near the true merged median (10000 values
    // 1..10k + 10001 values 5k..15k -> true median ~ 7500)
    val med = m.quantile(0.5)
    assert(med > 6500 && med < 8500, s"merged median $med")
  }

  test("derandomized compactor: same sequence => bit-identical sketch") {
    val xs = (1 to 50000).map(i => (i * 2654435761L % 100000).toDouble)
    val s1 = QuantileSketch.fromIter(xs.iterator, 128)
    val s2 = QuantileSketch.fromIter(xs.iterator, 128)
    assert(s1 == s2)
  }
}
