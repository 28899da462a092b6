package graft.functions

import graft.SparkSpec

class HllSketchSpec extends SparkSpec {

  /** The production input is poly31 over strings (x46). Two caveats drove
    * this exact shape: an arithmetic progression mod p is not hash-like
    * enough for HLL (structured high bits), and strings differing ONLY in
    * their final character get poly31 hashes differing by <10 (no
    * avalanche), collapsing runs of ids into one register update. A common
    * SUFFIX after the varying part multiplies the difference through
    * 31^|suffix| — the multi-character separation real tokens have. */
  private def hashOf(i: Long): Long = {
    var h = 0L
    s"item-$i-of-corpus".foreach(c => h = (h * 31 + c) % 2147483647L)
    h
  }

  test("registers are order- and partition-independent") {
    val agg = new HllAggregator(64)
    val keys = (0L until 5000L).map(hashOf)
    val fwd = keys.foldLeft(agg.zero)(agg.reduce)
    val rev = keys.reverse.foldLeft(agg.zero)(agg.reduce)
    val (l, r) = keys.splitAt(1234)
    val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
      r.foldLeft(agg.zero)(agg.reduce))
    assert(fwd.toSeq === rev.toSeq)
    assert(fwd.toSeq === merged.toSeq)
  }

  test("duplicates never move the registers") {
    val agg = new HllAggregator(64)
    val once = (0L until 800L).map(hashOf)
    val thrice = once ++ once ++ once
    assert(once.foldLeft(agg.zero)(agg.reduce).toSeq ===
      thrice.foldLeft(agg.zero)(agg.reduce).toSeq)
  }

  /** A strong 31-bit mix (splitmix-style finalizer) isolates the ESTIMATOR
    * math from hash quality — poly31 over sequential ids can wander past
    * 3 sigma (see hashOf's scaladoc; at n=10000 it lands at -45%), while
    * real-text shingles behave (x46: within ±8.3% on the corpus). */
  private def mixed31(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    (x ^ (x >>> 31)) & 0x7FFFFFFFL
  }

  test("estimate lands within 3 sigma of the true distinct count") {
    val agg = new HllAggregator(64)
    for (n <- Seq(1000, 10000, 100000)) {
      val regs = (0L until n.toLong).map(mixed31).foldLeft(agg.zero)(agg.reduce)
      val (sumPow, _) = HllSketch.summarize(regs, agg.maxRank)
      val est = HllSketch.Alpha64 * 64 * 64 * (1L << agg.maxRank) / sumPow
      val rse = 1.04 / math.sqrt(64) // ~13%
      assert(math.abs(est / n - 1.0) < 3 * rse,
        s"n=$n est=$est off by ${est / n - 1.0}")
    }
  }

  test("rank handling at the extremes: v=0 gets maxRank, v=max gets 1") {
    val agg = new HllAggregator(64)
    // h < 64: bucket j = h, v = 0 -> rank 26
    val low = agg.reduce(agg.zero, 5L)
    assert(low(5) === 26.toByte)
    // largest 31-bit hash: v = (2^31 - 2) / 64 has bit length 25 -> rank 1
    val high = agg.reduce(agg.zero, 2147483646L)
    assert(high((2147483646L % 64).toInt) === 1.toByte)
  }
}
