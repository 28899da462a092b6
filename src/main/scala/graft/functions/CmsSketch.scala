package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min sketch (Cormode & Muthukrishnan 2005, public) as a mergeable
  * Long-array aggregate — the heavy-hitter counterpart of
  * [[HllAggregator]]: `depth` rows × `width` cells, each input hash
  * increments one cell per row, estimates are the min over rows (always an
  * OVER-estimate). Cell updates are integer additions, so the sketch is
  * bit-identical under any partitioning and merges associatively — the
  * property that makes frequency estimation at 100 TB a map-side fold: the
  * shuffle carries depth·width Longs per partition, not one row per token.
  *
  * Row hashes are SQL-replayable integer math over an upstream 31-bit hash
  * (poly31): pos_r = ((h · A_r + B_r) mod (2^31−1)) mod width with fixed
  * odd multipliers — an external oracle rebuilds every cell exactly.
  */
class CmsAggregator(val depth: Int = 3, val width: Int = 1024)
    extends Aggregator[Long, Array[Long], Array[Long]] with Serializable {
  require(depth >= 1 && depth <= CmsSketch.RowA.length,
    s"depth must be 1..${CmsSketch.RowA.length}, got $depth")

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var r = 0
    while (r < depth) {
      buf(r * width + CmsSketch.pos(h, r, width)) += 1L
      r += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object CmsSketch {
  /** Fixed per-row hash multipliers/offsets — small odd constants so
    * h·A_r stays far below 2^63 for 31-bit h and the oracle's BIGINT
    * arithmetic never overflows. */
  val RowA: Array[Long] = Array(31L, 37L, 41L, 43L, 47L)
  val RowB: Array[Long] = Array(7L, 11L, 13L, 17L, 19L)

  /** Cell index of hash `h` in sketch row `r`. */
  def pos(h: Long, r: Int, width: Int): Int =
    (((h * RowA(r) + RowB(r)) % 2147483647L) % width).toInt

  /** Point estimate: min over rows of the addressed cells. */
  def estimate(cells: Array[Long], h: Long, depth: Int, width: Int): Long = {
    var est = Long.MaxValue
    var r = 0
    while (r < depth) {
      val v = cells(r * width + pos(h, r, width))
      if (v < est) est = v
      r += 1
    }
    est
  }
}
