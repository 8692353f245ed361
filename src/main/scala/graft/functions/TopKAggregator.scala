package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Scored item flowing into a top-k aggregation. */
final case class Scored(id: Long, score: Double)

/** Typed `Aggregator[IN, BUF, OUT]` exemplar (SURVEY.md §2B UDAF
  * surface): exact top-k by (score DESC, id ASC) with a bounded buffer.
  *
  * Scale rationale vs the window-function formulation
  * (`row_number().over(partitionBy(q).orderBy(score.desc)) <= k`): the
  * window sorts EVERY row of each partition after a full shuffle; this
  * aggregator keeps only k candidates per group on the map side, so the
  * shuffle carries ≤ k rows per group per mapper instead of the whole
  * score set — the difference between shuffling 100 TB of pairs and
  * shuffling k·|groups| rows.
  */
class TopKAggregator(k: Int)
  extends Aggregator[Scored, mutable.PriorityQueue[Scored], Seq[Scored]] {

  // rank order: "less" = better (higher score, then lower id). The
  // PriorityQueue dequeues its MAX, i.e. the current WORST — exactly
  // what a bounded top-k buffer evicts.
  private val heapOrd: Ordering[Scored] =
    Ordering.by((s: Scored) => (-s.score, s.id))

  override def zero: mutable.PriorityQueue[Scored] =
    new mutable.PriorityQueue[Scored]()(heapOrd)

  override def reduce(
      buf: mutable.PriorityQueue[Scored], item: Scored): mutable.PriorityQueue[Scored] = {
    if (buf.size < k) buf.enqueue(item)
    else if (heapOrd.lt(item, buf.head)) { buf.dequeue(); buf.enqueue(item) }
    buf
  }

  override def merge(
      a: mutable.PriorityQueue[Scored],
      b: mutable.PriorityQueue[Scored]): mutable.PriorityQueue[Scored] = {
    b.foreach(item => reduce(a, item))
    a
  }

  override def finish(buf: mutable.PriorityQueue[Scored]): Seq[Scored] =
    buf.toSeq.sortBy(s => (-s.score, s.id))

  override def bufferEncoder: Encoder[mutable.PriorityQueue[Scored]] =
    Encoders.kryo[mutable.PriorityQueue[Scored]]

  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}
