package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mutable buffer for element-wise vector mean. */
case class VMBuf(var sum: Array[Double], var n: Long)

/**
 * Element-wise mean over an `array<double>` column — the story-centroid /
 * user-profile aggregate (reference: batch-cluster-service.py:128-130,
 * recommendation-trainer.py:58-69).
 *
 * A single typed Aggregator avoids the `posexplode → groupBy(key, pos) →
 * re-assemble` alternative, which multiplies shuffle rows by the vector
 * dimensionality (384× in the reference's model). Partial aggregation
 * (map-side combine) comes free from Spark's agg planning: `reduce` runs
 * map-side, `merge` combines per-key partials after the shuffle, so only
 * one (sum, count) pair per group ever crosses the wire.
 */
object VectorMeanAgg extends Aggregator[Seq[Double], VMBuf, Seq[Double]] {
  override def zero: VMBuf = VMBuf(Array.emptyDoubleArray, 0L)
  override def reduce(b: VMBuf, a: Seq[Double]): VMBuf = {
    if (a == null || a.isEmpty) return b
    if (b.n == 0L) { b.sum = a.toArray; b.n = 1L; return b }
    val s = b.sum; val n = math.min(s.length, a.length)
    var i = 0
    while (i < n) { s(i) += a(i); i += 1 }
    b.n += 1L
    b
  }
  override def merge(x: VMBuf, y: VMBuf): VMBuf = {
    if (y.n == 0L) return x
    if (x.n == 0L) return y
    val s = x.sum; val t = y.sum; val n = math.min(s.length, t.length)
    var i = 0
    while (i < n) { s(i) += t(i); i += 1 }
    x.n += y.n
    x
  }
  override def finish(b: VMBuf): Seq[Double] =
    if (b.n == 0L) Seq.empty
    else { val inv = 1.0 / b.n; b.sum.map(_ * inv).toSeq }
  override def bufferEncoder: Encoder[VMBuf] = Encoders.product[VMBuf]
  override def outputEncoder: Encoder[Seq[Double]] = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object VectorMean {
  /** Usage: df.groupBy(k).agg(VectorMean(col("embedding").cast("array<double>"))) */
  private lazy val fn = udaf(VectorMeanAgg)
  def apply(c: Column): Column = fn(c)
}
