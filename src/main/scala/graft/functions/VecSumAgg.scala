package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** First-moment accumulator for a d-dim embedding column: one pass
  * collects n and Σx — the centroid-update step of Lloyd's k-means
  * (cluster mean = Σx / n).
  *
  * Scale rationale (same family as [[CovAggregator]]): the naive
  * formulation explodes each vector into d (i, x_i) rows and groupBys —
  * a d-fold row blowup shuffled every iteration. This aggregator keeps
  * the whole state in one d+1 doubles buffer (~0.5 KB at d=64) per
  * partition per group, combines map-side, and ships exactly one
  * buffer per (partition, cluster) — the per-iteration shuffle is
  * O(partitions · k · d) bytes, independent of corpus size. */
class VecSumAgg(d: Int) extends Aggregator[Seq[Double], Array[Double], Array[Double]] {

  // layout: [0] = n, [1..d] = Σx
  override def zero: Array[Double] = new Array[Double](1 + d)

  override def reduce(buf: Array[Double], x: Seq[Double]): Array[Double] = {
    if (x == null) return buf
    require(x.length == d, s"vector has dim ${x.length}, expected $d")
    buf(0) += 1
    var i = 0
    while (i < d) { buf(1 + i) += x(i); i += 1 }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Double]): Array[Double] = buf

  override def bufferEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
