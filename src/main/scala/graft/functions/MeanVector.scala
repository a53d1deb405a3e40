package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: arithmetic mean of an array<double> column (the reference
  * reducer's per-column average, src/Kmeans.java:99-112, as constant-size
  * state).
  *
  * Buffer is (sum-vector, count) — O(dim) per group regardless of group
  * size, with map-side partial aggregation. This is the spill-safe
  * replacement for the reference's whole-group ArrayList buffering
  * (the anti-pattern called out in SURVEY.md §4).
  *
  * Usage: `df.groupBy("k").agg(MeanVector.toColumn(col))` via
  * `udaf(MeanVector)` registered as `mean_vector`, or typed
  * `ds.groupByKey(...).agg(MeanVector.toColumn)`.
  */
final case class MeanVectorBuf(sum: Array[Double], n: Long)

object MeanVector extends Aggregator[Seq[Double], MeanVectorBuf, Seq[Double]] {
  type Buf = MeanVectorBuf
  private def Buf(s: Array[Double], n: Long): MeanVectorBuf = MeanVectorBuf(s, n)

  def zero: Buf = Buf(Array.emptyDoubleArray, 0L)

  def reduce(b: Buf, a: Seq[Double]): Buf = {
    if (a == null) return b
    if (b.n == 0L) Buf(a.toArray, 1L)
    else {
      // loud ragged guard (the kernel family's contract): unguarded,
      // whichever vector a partition reduced FIRST fixed the dimension —
      // a longer later vector's tail was silently dropped, a shorter one
      // threw a bare index error, and which happened depended on row
      // order, so the same data gave wrong-answer or crash
      // nondeterministically
      require(a.length == b.sum.length,
        s"ragged vector: ${a.length} dims vs ${b.sum.length} in mean-vector aggregate")
      val s = b.sum
      var i = 0
      while (i < s.length) { s(i) += a(i); i += 1 }
      Buf(s, b.n + 1)
    }
  }

  def merge(x: Buf, y: Buf): Buf = {
    if (x.n == 0L) y
    else if (y.n == 0L) x
    else {
      require(x.sum.length == y.sum.length,
        s"ragged vector: ${x.sum.length} dims vs ${y.sum.length} in mean-vector merge")
      val s = x.sum
      var i = 0
      while (i < s.length) { s(i) += y.sum(i); i += 1 }
      Buf(s, x.n + y.n)
    }
  }

  def finish(b: Buf): Seq[Double] =
    if (b.n == 0L) Seq.empty else b.sum.map(_ / b.n).toSeq

  def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()

  override def toString: String = "mean_vector"
}
