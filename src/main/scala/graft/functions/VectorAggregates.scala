package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY §2.9): vector centroid as an
  * `Aggregator[IN, BUF, OUT]` — partial aggregation happens map-side
  * (reduce), so the shuffle carries one (sums, count) buffer per group per
  * partition instead of every vector: the same partial-agg shape Spark's
  * built-in aggregates get, available to custom vector math.
  */
object VectorAggregates {

  final case class CentroidBuf(sums: Array[Double], n: Long)

  /** Mean vector of a group of float embeddings (dimension fixed). */
  final class CentroidAggregator(dim: Int)
      extends Aggregator[Seq[Float], CentroidBuf, Seq[Double]] {

    override def zero: CentroidBuf = CentroidBuf(new Array[Double](dim), 0L)

    override def reduce(b: CentroidBuf, v: Seq[Float]): CentroidBuf = {
      var i = 0
      while (i < dim && i < v.length) { b.sums(i) += v(i); i += 1 }
      CentroidBuf(b.sums, b.n + 1)
    }

    override def merge(a: CentroidBuf, b: CentroidBuf): CentroidBuf = {
      var i = 0
      while (i < dim) { a.sums(i) += b.sums(i); i += 1 }
      CentroidBuf(a.sums, a.n + b.n)
    }

    override def finish(b: CentroidBuf): Seq[Double] =
      if (b.n == 0) Seq.fill(dim)(0.0) else b.sums.map(_ / b.n).toSeq

    override def bufferEncoder: Encoder[CentroidBuf] = Encoders.product[CentroidBuf]
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }
}
