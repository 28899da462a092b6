package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Broadcast Bloom-filter membership — the zero-shuffle contamination path.
  *
  * [[Dedup.contamination]] (x21) meets corpus and benchmark gram streams in
  * an equi-join; correct, but at 100 TB the corpus gram stream still
  * shuffles. The production alternative (reference semantics:
  * dataset_util.py's id-set membership checks, generalized): fold the SMALL
  * side into an m-bit Bloom filter ONCE — a mergeable byte-array aggregate,
  * so executors OR map-side partials and one m/8-byte array reaches the
  * driver — broadcast it, and probe the 100 TB side row-locally. The corpus
  * never shuffles and is read exactly once. False positives over-flag at a
  * bounded rate ((1 - e^{-kn/m})^k); never under-flag — the safe direction
  * for contamination removal, where a missed hit leaks benchmark text into
  * training data but an over-flag merely drops a clean doc.
  *
  * All hash math is integer and SQL-replayable: grams are poly31 keys
  * ([[Dedup.wordGramHashUdf]]) and the k probe positions come from double
  * hashing (Kirsch–Mitzenmacher: pos_i = h1 + i·h2 mod m), so an external
  * oracle rebuilds the identical bitset from raw text.
  */
object Bloom {

  /** 2^20 bits = 128 KiB — comfortably broadcastable; at k=3 holds ~10^5
    * distinct benchmark grams under 1% false-positive rate. */
  val DefaultBits: Int = 1 << 20
  val DefaultHashes: Int = 3

  /** k probe positions for one gram hash (h in [0, 2^31), the poly31
    * range). h1/h2 are integer-derived so DuckDB replays them:
    * h1 = h mod m, h2 = 1 + (h div m) mod (m-1), pos_i = (h1 + i·h2) mod m.
    * h2 >= 1 guarantees the k positions don't all collapse onto h1. */
  private[ops] def positions(h: Long, m: Int, k: Int): Array[Int] = {
    val h1 = (h % m).toInt
    val h2 = (1L + (h / m) % (m - 1)).toInt
    Array.tabulate(k)(i => ((h1 + i.toLong * h2) % m).toInt)
  }

  private def setBit(bits: Array[Byte], pos: Int): Unit =
    bits(pos >>> 3) = (bits(pos >>> 3) | (1 << (pos & 7))).toByte

  private def getBit(bits: Array[Byte], pos: Int): Boolean =
    (bits(pos >>> 3) & (1 << (pos & 7))) != 0

  private[ops] def mightContain(bits: Array[Byte], h: Long, m: Int, k: Int): Boolean = {
    val ps = positions(h, m, k)
    var i = 0
    while (i < k) { if (!getBit(bits, ps(i))) return false; i += 1 }
    true
  }

  /** Mergeable Bloom build: reduce sets k bits per element, merge ORs two
    * bitsets — associative and commutative, so Spark runs it as map-side
    * partials + one tiny final merge (the aggregate that replaces a shuffle
    * of the big probe side). Insertion is idempotent, so the input needs NO
    * distinct() — duplicate grams cost nothing. */
  class BloomAggregator(m: Int, k: Int)
      extends Aggregator[Long, Array[Byte], Array[Byte]] with Serializable {
    require(m % 8 == 0, s"bloom bit count must be byte-aligned, got $m")
    def zero: Array[Byte] = new Array[Byte](m / 8)
    def reduce(buf: Array[Byte], h: Long): Array[Byte] = {
      val ps = positions(h, m, k)
      var i = 0
      while (i < k) { setBit(buf, ps(i)); i += 1 }
      buf
    }
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
      a
    }
    def finish(r: Array[Byte]): Array[Byte] = r
    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Aggregate a column of gram hashes into one Bloom bitset. One Spark
    * action collecting a single m/8-byte row — the build half of the
    * build-then-broadcast pattern (cf. Similarity.seedVectors' k-row
    * collect, adjudicated as the correct driver-side shape). */
  def build(hashes: DataFrame, m: Int = DefaultBits, k: Int = DefaultHashes): Array[Byte] = {
    import hashes.sparkSession.implicits._
    hashes.as[Long].select(new BloomAggregator(m, k).toColumn).head()
  }

  /** Bloom-filter contamination: per corpus doc, how many of its distinct
    * word n-gram hashes hit the benchmark filter (docs hitting none are
    * dropped; benchmark members are excluded — x21's contract). Identical
    * output shape to [[Dedup.contamination]], different 100 TB cost: the
    * benchmark side folds to one broadcast bitset and the corpus side is a
    * pure row-local map — zero shuffle on the big side. */
  def contaminationByBloom(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int = 8, m: Int = DefaultBits,
      k: Int = DefaultHashes): DataFrame = {
    val gramUdf = Dedup.wordGramHashUdf(n)
    val benchHashes = bench
      .select(explode(gramUdf(TextFunctions.tokens(col(textCol)))).as("gram"))
    val bits = build(benchHashes, m, k)
    val bc = corpus.sparkSession.sparkContext.broadcast(bits)
    val (mm, kk) = (m, k)
    val probeUdf = udf { grams: Seq[Long] =>
      // wordGramHashUdf already emits DISTINCT hashes per doc, so this
      // count is over distinct grams, matching x21's countDistinct
      var c = 0L
      grams.foreach(h => if (mightContain(bc.value, h, mm, kk)) c += 1)
      c
    }
    corpus
      .join(bench.select(col(idCol)), Seq(idCol), "left_anti")
      .select(col(idCol),
        probeUdf(gramUdf(TextFunctions.tokens(col(textCol)))).as("n_flagged"))
      .filter(col("n_flagged") > 0)
  }

  /** Semi-join reduction via a broadcast Bloom filter — the device that
    * makes a big⋈small join cheap when the small side is selective: fold
    * the small side's join keys into one m-bit filter (map-side-OR'd
    * mergeable aggregate), broadcast it, and drop big-side rows that
    * cannot match BEFORE the join's shuffle. The result is exactly
    * `big.join(small, key)` — the filter never false-negatives, and any
    * false positive is eliminated by the real join that follows; only the
    * shuffled volume changes (at 100 TB, from the full fact table to
    * ~the matching fraction). Spark's own runtime row-level filtering
    * does this adaptively; here it is an explicit, tunable operator.
    *
    * Keys hash through xxhash64 folded into the 31-bit double-hash domain
    * of [[positions]]. */
  def bloomPrunedJoin(big: DataFrame, small: DataFrame, key: String,
      m: Int = DefaultBits, k: Int = DefaultHashes): DataFrame = {
    def keyHash(c: org.apache.spark.sql.Column) =
      pmod(xxhash64(c), lit(2147483647L))
    val bits = build(small.select(keyHash(col(key)).as("h")), m, k)
    val bc = big.sparkSession.sparkContext.broadcast(bits)
    val (mm, kk) = (m, k)
    val probeUdf = udf { h: Long => mightContain(bc.value, h, mm, kk) }
    big.filter(probeUdf(keyHash(col(key)))).join(small, key)
  }
}
