package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native aggregates for the dedup signature pipelines (SURVEY.md §2B
  * Q28c/Q28d).
  *
  * The column-per-hash formulation (`64 × sum(when(bit,1,-1))` for
  * SimHash, `128 × min(xxhash64(lit(i), h))` for MinHash) is
  * semantically right but generates enormous aggregate codegen (hundreds
  * of buffer slots with null tracking, megabytes of Java source per
  * query) whose JIT/compile cost dominated the whole query on the
  * benchmark box. These typed aggregates keep ALL counters in one
  * primitive-array buffer: one buffer slot, one tight update loop, no
  * per-column overhead — and reproduce the exact same hash family
  * (catalyst `XXH64`, seed 42, same chaining as the `xxhash64` SQL
  * function) so candidate sets are bit-identical to the columnar form.
  */

/** 64-bit SimHash over a group of 64-bit token hashes: per bit,
  * +1 if set / −1 if clear, summed across the group; the output bit is
  * 1 iff the sum is positive. One `Array[Int](64)` buffer. */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] with UnaryLike[Expression] {

  override def prettyName: String = "simhash_agg"
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) buf(b) += 1 else buf(b) -= 1
        b += 1
      }
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    var r = 0L
    var b = 0
    while (b < 64) { if (buf(b) > 0) r |= (1L << b); b += 1 }
    r
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 4)
    var i = 0
    while (i < 64) { bb.putInt(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Int](64)
    var i = 0
    while (i < 64) { buf(i) = bb.getInt(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SimHashAgg =
    copy(child = newChild)
}

/** k-permutation MinHash signature of a group of 64-bit shingle hashes:
  * slot i holds min over the group of `XXH64(h, seed_i)` where
  * `seed_i = XXH64.hashInt(i, 42)` — exactly the value the SQL
  * `min(xxhash64(lit(i), h))` computes (xxhash64 chains children
  * starting from seed 42), so signatures are bit-identical to the
  * 128-column formulation. One `Array[Long](k)` buffer. */
case class MinHashAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
    bandRows: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(k > 0, "minhash_agg: k must be positive")
  require(bandRows >= 0 && (bandRows == 0 || k % bandRows == 0),
    "minhash_agg: bandRows must divide k")

  override def prettyName: String = "minhash_agg"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(k)(i => XXH64.hashInt(i, 42L))

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val s = seeds
      var i = 0
      while (i < k) {
        val x = XXH64.hashLong(h, s(i))
        if (x < buf(i)) buf(i) = x
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  /** With bandRows = r > 0 the output is the k/r LSH band signatures
    * instead of the raw minima: band j = the same XXH64 chain the SQL
    * `xxhash64(m_{rj}, …, m_{rj+r-1})` computes (seed 42, hashLong per
    * element). Folding the banding into eval keeps the query-side
    * expression tree small — the 128-element_at + 32-hash columnar
    * banding was a codegen/JIT hotspot. */
  override def eval(buf: Array[Long]): Any =
    if (bandRows == 0) new GenericArrayData(buf.clone())
    else {
      val bands = new Array[Long](k / bandRows)
      var j = 0
      while (j < bands.length) {
        var h = 42L
        var r = 0
        while (r < bandRows) { h = XXH64.hashLong(buf(j * bandRows + r), h); r += 1 }
        bands(j) = h
        j += 1
      }
      new GenericArrayData(bands)
    }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(k * 8)
    var i = 0
    while (i < k) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](k)
    var i = 0
    while (i < k) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)
}

/** Mutable buffer for [[PrefixMinAgg]]: the group's prefix size `p`
  * (unknown until the first row arrives — it derives from the group's
  * constant shingle count `n`) and a max-heap of the p smallest
  * (df, h) pairs seen so far. */
final class PrefixBuf(
    var p: Int,
    val heap: scala.collection.mutable.PriorityQueue[(Long, Long)])

/** Per-group prefix selection for the PPJoin candidate stage: keeps
  * each group's p = n − ⌈t·n⌉ + 1 smallest (df, h) pairs, i.e. the
  * RAREST shingles whose global document-frequency order defines the
  * prefix-filter guarantee. Replaces a `row_number()` window (full
  * shuffle + sort of every (doc, shingle) row) with an aggregate whose
  * map-side partials already cap each group at p elements — the
  * exchange carries ≤ p rows per doc per mapper instead of the whole
  * inverted index. Selection by k-smallest is a semilattice, so
  * partial/merge order cannot change the result. */
case class PrefixMinAgg(
    dfCol: Expression,
    hCol: Expression,
    nCol: Expression,
    t: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PrefixBuf] {

  require(t > 0.0 && t <= 1.0, "prefix_min_agg: threshold in (0, 1]")

  override def prettyName: String = "prefix_min_agg"
  override def children: Seq[Expression] = Seq(dfCol, hCol, nCol)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  // max-heap on (df, h): head is the current worst candidate
  private implicit val ord: Ordering[(Long, Long)] = Ordering.Tuple2[Long, Long]

  override def createAggregationBuffer(): PrefixBuf =
    new PrefixBuf(-1, scala.collection.mutable.PriorityQueue.empty[(Long, Long)])

  override def update(buf: PrefixBuf, input: InternalRow): PrefixBuf = {
    val dfV = dfCol.eval(input)
    val hV = hCol.eval(input)
    val nV = nCol.eval(input)
    if (dfV != null && hV != null && nV != null) {
      if (buf.p < 0) {
        val n = nV.asInstanceOf[Number].longValue()
        buf.p = (n - math.ceil(n * t).toLong + 1L).toInt.max(0)
      }
      val pair = (dfV.asInstanceOf[Number].longValue(), hV.asInstanceOf[Long])
      if (buf.heap.size < buf.p) buf.heap.enqueue(pair)
      else if (buf.p > 0 && ord.lt(pair, buf.heap.head)) {
        buf.heap.dequeue(); buf.heap.enqueue(pair)
      }
    }
    buf
  }

  override def merge(a: PrefixBuf, b: PrefixBuf): PrefixBuf = {
    if (a.p < 0) a.p = b.p
    b.heap.foreach { pair =>
      if (a.heap.size < a.p) a.heap.enqueue(pair)
      else if (a.p > 0 && ord.lt(pair, a.heap.head)) {
        a.heap.dequeue(); a.heap.enqueue(pair)
      }
    }
    a
  }

  override def eval(buf: PrefixBuf): Any =
    new GenericArrayData(buf.heap.toArray.sorted.map(_._2))

  override def serialize(buf: PrefixBuf): Array[Byte] = {
    val arr = buf.heap.toArray
    val bb = ByteBuffer.allocate(8 + arr.length * 16)
    bb.putInt(buf.p); bb.putInt(arr.length)
    arr.foreach { case (d, h) => bb.putLong(d); bb.putLong(h) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): PrefixBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val p = bb.getInt(); val sz = bb.getInt()
    val heap = scala.collection.mutable.PriorityQueue.empty[(Long, Long)]
    var i = 0
    while (i < sz) { heap.enqueue((bb.getLong(), bb.getLong())); i += 1 }
    new PrefixBuf(p, heap)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): PrefixMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PrefixMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PrefixMinAgg =
    copy(dfCol = newChildren(0), hCol = newChildren(1), nCol = newChildren(2))
}

/** SpaceSaving summary: token → (count, overestimation error). */
final class SpaceSavingBuf(
    var items: scala.collection.mutable.HashMap[String, (Long, Long)])

/** SpaceSaving heavy-hitters sketch (Metwally et al., "Efficient
  * computation of frequent and top-k elements in data streams"):
  * a bounded m-entry summary where an unseen item evicts the current
  * minimum and inherits its count as overestimation error. Guarantees
  * every item with true frequency > N/m is present in a single summary;
  * merging replays one summary's entries as a weighted stream through
  * the same evict-min step, which widens the error bound by the
  * inherited minima — callers therefore use it as a
  * CANDIDATE GENERATOR (recall engine) and recount candidates exactly,
  * the same sketch-then-verify shape as the MinHash/SimHash pipelines.
  *
  * Scale: the shuffle carries one m-entry summary per partition instead
  * of the full |vocab| aggregation — heavy-hitter detection over 100 TB
  * of tokens with map-side memory bounded at m entries.
  */
case class SpaceSavingAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingBuf] with UnaryLike[Expression] {

  require(capacity > 0, "space_saving: capacity must be positive")

  override def prettyName: String = "space_saving"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): SpaceSavingBuf =
    new SpaceSavingBuf(scala.collection.mutable.HashMap.empty)

  private def offer(buf: SpaceSavingBuf, token: String, cnt: Long, err: Long): Unit = {
    buf.items.get(token) match {
      case Some((c, e)) => buf.items.update(token, (c + cnt, e + err))
      case None if buf.items.size < capacity => buf.items.update(token, (cnt, err))
      case None =>
        // evict the minimum-count entry; the newcomer inherits its count
        // as an upper-bound error (the classic SpaceSaving step)
        val (minTok, (minCnt, _)) = buf.items.minBy { case (t, (c, _)) => (c, t) }
        buf.items.remove(minTok)
        buf.items.update(token, (minCnt + cnt, minCnt + err))
    }
  }

  override def update(buf: SpaceSavingBuf, input: InternalRow): SpaceSavingBuf = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.toString, 1L, 0L)
    buf
  }

  // merge = replay b's entries as a weighted stream through offer(),
  // which evicts as it goes — the size can never exceed capacity, so no
  // post-merge truncation is needed (the eviction inherits the min
  // count, preserving the count-upper-bound and recall guarantees)
  override def merge(a: SpaceSavingBuf, b: SpaceSavingBuf): SpaceSavingBuf = {
    b.items.foreach { case (t, (c, e)) => offer(a, t, c, e) }
    a
  }

  override def eval(buf: SpaceSavingBuf): Any =
    new GenericArrayData(
      buf.items.toSeq.sortBy { case (t, (c, _)) => (-c, t) }
        .map { case (t, _) => org.apache.spark.unsafe.types.UTF8String.fromString(t) })

  override def serialize(buf: SpaceSavingBuf): Array[Byte] = {
    val entries = buf.items.toSeq.map { case (t, (c, e)) =>
      (t.getBytes(java.nio.charset.StandardCharsets.UTF_8), c, e)
    }
    val bb = ByteBuffer.allocate(4 + entries.map(_._1.length + 20).sum)
    bb.putInt(entries.length)
    entries.foreach { case (tb, c, e) =>
      bb.putInt(tb.length); bb.put(tb); bb.putLong(c); bb.putLong(e)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val m = scala.collection.mutable.HashMap.empty[String, (Long, Long)]
    var i = 0
    while (i < n) {
      val len = bb.getInt(); val tb = new Array[Byte](len); bb.get(tb)
      m.update(new String(tb, java.nio.charset.StandardCharsets.UTF_8),
        (bb.getLong(), bb.getLong()))
      i += 1
    }
    new SpaceSavingBuf(m)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SpaceSavingAgg =
    copy(child = newChild)
}
