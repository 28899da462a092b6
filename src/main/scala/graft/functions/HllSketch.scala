package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** HyperLogLog registers as a mergeable byte-array aggregate (Flajolet et
  * al. 2007) — the hand-built counterpart of `approx_count_distinct`'s
  * HLL++ (exercised by q45), exposed so the SKETCH itself is a first-class
  * value: registers can be stored per partition/day and merged later, the
  * property that makes distinct-counting at 100 TB a map-side fold instead
  * of a distinct shuffle. Element order never matters (registers are
  * per-bucket maxima), so the result is deterministic under any Spark
  * partitioning — and SQL-replayable: input is a 31-bit integer hash
  * (poly31 upstream), bucket = h mod m, rank = 1 + leading-zero count of
  * the remaining 31-log2(m) bits, all integer math an external oracle
  * recomputes (bit length via binary printf).
  *
  * The estimate is derived OUTSIDE the aggregate from two integer
  * summaries (sum of 2^(maxRank-reg), count of zero registers) so the
  * floating-point part is a single division both engines perform on
  * identical integers.
  *
  * Hash-quality caveat: poly31 has no avalanche — inputs differing only in
  * their last character land <10 apart and collapse into one register
  * update. Natural-language tokens/shingles differ across many positions
  * (x46 lands within the m=64 RSE on the harness corpus), but for id-like
  * or adversarial inputs feed this a mixed hash instead (any 31-bit
  * finalizer; it must then be mirrored in the oracle).
  */
class HllAggregator(val m: Int = 64)
    extends Aggregator[Long, Array[Byte], Array[Byte]] with Serializable {
  require(m >= 16 && Integer.bitCount(m) == 1, s"m must be a power of two >= 16, got $m")
  private val bucketBits = Integer.numberOfTrailingZeros(m)
  /** rank of a value whose post-bucket bits are all zero: one past the
    * widest possible bit length (31 - bucketBits value bits). */
  val maxRank: Int = 31 - bucketBits + 1

  def zero: Array[Byte] = new Array[Byte](m)
  def reduce(buf: Array[Byte], h: Long): Array[Byte] = {
    val j = (h % m).toInt
    val v = h / m
    val bitLen = 64 - java.lang.Long.numberOfLeadingZeros(v) // 0 when v == 0
    val rank = maxRank - bitLen
    if (rank > buf(j)) buf(j) = rank.toByte
    buf
  }
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < a.length) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }
  def finish(r: Array[Byte]): Array[Byte] = r
  def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object HllSketch {
  /** alpha_64: the standard HLL bias constant for m = 64. */
  val Alpha64 = 0.709

  /** Integer summaries of a register array: (sum of 2^(maxRank - reg),
    * zero-register count). The raw estimate is
    * alpha * m^2 * 2^maxRank / sum — kept exact-integer up to the one
    * final division so engine and oracle round identically. */
  def summarize(regs: Array[Byte], maxRank: Int): (Long, Long) = {
    var s = 0L
    var z = 0L
    regs.foreach { r =>
      s += 1L << (maxRank - r)
      if (r == 0) z += 1
    }
    (s, z)
  }
}
