package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Mergeable quantile sketch — the compactor family (Manku, Rajagopalan &
  * Lindsay, "Approximate medians and other quantiles in one pass and with
  * limited memory", SIGMOD 1998; Karnin, Lang & Liberty, "Optimal quantile
  * approximation in streams", FOCS 2016). The missing member of the
  * suite's sketch shelf (HLL x46, count-min x53, Bloom x45): a bounded
  * O(k·log(n/k)) state that answers ANY rank/quantile query within εn
  * rank error and merges associatively — the shape a 100 TB percentile
  * needs (per-partition build, tree-reduce merge; no global sort, no
  * per-group value collection).
  *
  * Deterministic variant: each level keeps a sorted buffer of up to k
  * items with weight 2^level; a full buffer compacts by keeping
  * alternate items of the sorted run, with the starting offset taken
  * from a per-level flip bit that toggles every compaction (the
  * derandomized alternating compactor — KLL §2.1 note on deterministic
  * compaction achieving the same worst-case rank error, without the
  * coin). Same input sequence ⇒ bit-identical sketch; the estimate is
  * still merge-ORDER-dependent across partitionings, which is why this
  * op is spec-gated (error bounds, exactness, determinism) rather than
  * oracle-hashed — the x84/Opq precedent.
  */
object QuantileSketch {

  /** Immutable sketch state. `levels(i)` is a sorted run of items with
    * weight 2^i; `flips(i)` is level i's next compaction offset. */
  case class QSketch(k: Int, levels: Seq[Seq[Double]], flips: Seq[Boolean],
      n: Long, lo: Double, hi: Double) {

    def quantile(q: Double): Double = {
      require(n > 0, "empty sketch")
      if (q <= 0) return lo
      if (q >= 1) return hi
      val items = levels.zipWithIndex.flatMap { case (buf, l) =>
        val w = 1L << l; buf.map(v => (v, w))
      }.sortBy(_._1)
      val total = items.iterator.map(_._2).sum
      val target = q * total
      var acc = 0L
      var i = 0
      while (i < items.length) {
        acc += items(i)._2
        if (acc >= target) return items(i)._1
        i += 1
      }
      hi
    }

    /** Estimated rank (fraction of items <= x). */
    def rankOf(x: Double): Double = {
      val total = levels.zipWithIndex.iterator
        .map { case (b, l) => b.length.toLong << l }.sum
      if (total == 0) return 0.0
      val below = levels.zipWithIndex.iterator.map { case (buf, l) =>
        (buf.count(_ <= x).toLong) << l
      }.sum
      below.toDouble / total
    }
  }

  def empty(k: Int): QSketch =
    QSketch(k, Seq(Vector.empty), Seq(false), 0L,
      Double.PositiveInfinity, Double.NegativeInfinity)

  /** One compaction pass: any level at/over capacity k spills half its
    * items (alternate elements of the sorted run, offset = flip bit) one
    * level up, toggling the bit. */
  private def compact(k: Int, levelsIn: Vector[Vector[Double]],
      flipsIn: Vector[Boolean]): (Vector[Vector[Double]], Vector[Boolean]) = {
    var levels = levelsIn
    var flips = flipsIn
    var i = 0
    while (i < levels.length) {
      if (levels(i).length >= k && levels(i).length >= 2) {
        val sorted = levels(i).sorted
        val off = if (flips(i)) 1 else 0
        val kept = sorted.indices.collect {
          case j if j % 2 == off => sorted(j)
        }.toVector
        if (i + 1 == levels.length) {
          levels = levels :+ Vector.empty[Double]
          flips = flips :+ false
        }
        levels = levels
          .updated(i, Vector.empty[Double])
          .updated(i + 1, (levels(i + 1) ++ kept).sorted)
        flips = flips.updated(i, !flips(i))
      }
      i += 1
    }
    (levels, flips)
  }

  /** Build a sketch from an iterator (one partition's worth). */
  def fromIter(it: Iterator[Double], k: Int): QSketch = {
    var levels = Vector(Vector.empty[Double])
    var flips = Vector(false)
    var n = 0L
    var lo = Double.PositiveInfinity
    var hi = Double.NegativeInfinity
    val buf = new scala.collection.mutable.ArrayBuffer[Double](k)
    def flush(): Unit = if (buf.nonEmpty) {
      levels = levels.updated(0, (levels(0) ++ buf).sorted)
      buf.clear()
      val (l2, f2) = compact(k, levels, flips)
      levels = l2; flips = f2
    }
    while (it.hasNext) {
      val v = it.next()
      n += 1
      if (v < lo) lo = v
      if (v > hi) hi = v
      buf += v
      if (buf.length >= k) flush()
    }
    flush()
    QSketch(k, levels, flips, n, lo, hi)
  }

  /** Associative merge: concatenate level-wise, then compact. */
  def merge(a: QSketch, b: QSketch): QSketch = {
    require(a.k == b.k, "mismatched k")
    if (a.n == 0) return b
    if (b.n == 0) return a
    val depth = math.max(a.levels.length, b.levels.length)
    var levels = Vector.tabulate(depth) { i =>
      val av = if (i < a.levels.length) a.levels(i) else Seq.empty
      val bv = if (i < b.levels.length) b.levels(i) else Seq.empty
      (av ++ bv).toVector.sorted
    }
    var flips = Vector.tabulate(depth) { i =>
      (i < a.flips.length && a.flips(i)) ^ (i < b.flips.length && b.flips(i))
    }
    val (l2, f2) = compact(a.k, levels, flips)
    levels = l2; flips = f2
    QSketch(a.k, levels, flips, a.n + b.n,
      math.min(a.lo, b.lo), math.max(a.hi, b.hi))
  }

  /** Distributed build: per-partition compactors, tree-reduced merge.
    * The only data movement is one sketch per partition. */
  def build(df: DataFrame, valueCol: String, k: Int = 256): QSketch = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds = df.select(col(valueCol).cast("double")).as[Double]
    val per = ds.mapPartitions(it => Iterator.single(fromIter(it, k)))(
      Encoders.product[QSketch])
    per.rdd.treeReduce(merge _, depth = 3)
  }
}
