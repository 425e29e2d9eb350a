package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise mean of a vector column as a typed Aggregator — the
  * centroid-update step of `Similarity.refineCentroids` (Lloyd/k-means
  * over an IVF quantizer). Partial buffers merge map-side: the shuffle
  * carries one (count, dim-length sum) buffer per (partition, cell),
  * never the member vectors, so a 100 TB corpus reduces to C buffers
  * per partition before the exchange.
  *
  * Length mismatches and empty input yield an empty mean (the caller's
  * empty-cluster rule keeps the previous centroid).
  */
object VecMeanAgg extends Aggregator[Seq[Double], VecSumBuf, Seq[Double]] {

  override def zero: VecSumBuf = VecSumBuf(0L, Seq.empty)

  override def reduce(b: VecSumBuf, v: Seq[Double]): VecSumBuf = {
    if (v == null || v.isEmpty) return b
    if (b.n == 0L) return VecSumBuf(1L, v)
    if (b.sum.length != v.length) return b // ragged input — skip
    val s = b.sum.toArray
    var i = 0
    while (i < s.length) { s(i) += v(i); i += 1 }
    VecSumBuf(b.n + 1, s.toSeq)
  }

  override def merge(a: VecSumBuf, b: VecSumBuf): VecSumBuf = {
    if (a.n == 0L) return b
    if (b.n == 0L) return a
    if (a.sum.length != b.sum.length) return a
    val s = a.sum.toArray
    var i = 0
    while (i < s.length) { s(i) += b.sum(i); i += 1 }
    VecSumBuf(a.n + b.n, s.toSeq)
  }

  override def finish(b: VecSumBuf): Seq[Double] =
    if (b.n == 0L) Seq.empty else b.sum.map(_ / b.n)

  override def bufferEncoder: Encoder[VecSumBuf] = Encoders.product[VecSumBuf]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

case class VecSumBuf(n: Long, sum: Seq[Double])
