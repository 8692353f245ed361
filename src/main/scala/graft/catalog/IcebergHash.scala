package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg's 32-bit bucket hash (spec Appendix B): murmur3 x86_32,
  * seed 0, over the spec's per-type byte encodings —
  *
  *   - int/long/date/time/timestamp → 8-byte little-endian long
  *     (ints and dates WIDEN to long first, so `bucket(n, intCol)`
  *     and `bucket(n, longCol)` agree on equal values)
  *   - string → UTF-8 bytes
  *   - binary/fixed → bytes as-is
  *   - decimal → minimum two's-complement big-endian of the unscaled
  *
  * `bucket(v) = (hash(v) & Int.MaxValue) % n`. This is the published
  * contract every Iceberg engine implements, which is what makes a
  * graft table written under it exportable WITH its bucket layout:
  * the mirror can claim `bucket[n]` partition tuples that external
  * engines prune by (reference `README.md:567-570` — the premise is
  * multi-engine access to one table). The implementation is from the
  * public spec + MurmurHash3 (Austin Appleby, public domain); the
  * Appendix B test vectors are asserted in IcebergExportSpec and
  * independently recomputed by `tools/check_iceberg.py`.
  */
object IcebergHash {

  private final val C1 = 0xcc9e2d51
  private final val C2 = 0x1b873593

  private def mixK1(k0: Int): Int = {
    var k = k0 * C1
    k = Integer.rotateLeft(k, 15)
    k * C2
  }

  private def mixH1(h0: Int, k: Int): Int = {
    var h = h0 ^ k
    h = Integer.rotateLeft(h, 13)
    h * 5 + 0xe6546b64
  }

  private def fmix(h0: Int, len: Int): Int = {
    var h = h0 ^ len
    h ^= h >>> 16
    h *= 0x85ebca6b
    h ^= h >>> 13
    h *= 0xc2b2ae35
    h ^= h >>> 16
    h
  }

  /** murmur3_x86_32(bytes, seed=0) — the reference algorithm, with the
    * standard tail handling (NOT Spark's lenient per-byte variant). */
  def hashBytes(data: Array[Byte]): Int = {
    val len = data.length
    val rounded = len & ~3
    var h = 0
    var i = 0
    while (i < rounded) {
      val k = (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8) |
        ((data(i + 2) & 0xff) << 16) | ((data(i + 3) & 0xff) << 24)
      h = mixH1(h, mixK1(k))
      i += 4
    }
    var k = 0
    val tail = len & 3
    if (tail >= 3) k ^= (data(rounded + 2) & 0xff) << 16
    if (tail >= 2) k ^= (data(rounded + 1) & 0xff) << 8
    if (tail >= 1) {
      k ^= data(rounded) & 0xff
      h ^= mixK1(k)
    }
    fmix(h, len)
  }

  /** Long hash = murmur3 of the 8-byte little-endian encoding, block
    * math inlined (two 4-byte blocks: low word, then high word). */
  def hashLong(v: Long): Int = {
    var h = mixH1(0, mixK1(v.toInt))
    h = mixH1(h, mixK1((v >>> 32).toInt))
    fmix(h, 8)
  }

  def hashString(s: UTF8String): Int = hashBytes(s.getBytes)

  def hashDecimal(d: org.apache.spark.sql.types.Decimal): Int =
    hashBytes(d.toJavaBigDecimal.unscaledValue.toByteArray)

  @inline private def pos(h: Int, n: Int): Int = (h & Int.MaxValue) % n

  // static-forwarder entry points for generated code (one call per row)
  def bucketLong(v: Long, n: Int): Int = pos(hashLong(v), n)
  def bucketUTF8(s: UTF8String, n: Int): Int = pos(hashString(s), n)
  def bucketBytes(b: Array[Byte], n: Int): Int = pos(hashBytes(b), n)
  def bucketDecimal(d: org.apache.spark.sql.types.Decimal, n: Int): Int =
    pos(hashDecimal(d), n)

  /** Types `bucket(n, col)` supports under `graft.bucket.hash=iceberg`
    * (the spec's bucket-transform source types minus float/double,
    * which Iceberg itself forbids as bucket sources). */
  def supports(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         TimestampType | TimestampNTZType | StringType | BinaryType => true
    case _: DecimalType => true
    case _ => false
  }

  /** Bucket id for a catalyst-internal value of type `dt`. */
  def bucketOf(v: Any, dt: DataType, n: Int): Int = dt match {
    case ByteType => bucketLong(v.asInstanceOf[Byte].toLong, n)
    case ShortType => bucketLong(v.asInstanceOf[Short].toLong, n)
    case IntegerType | DateType => bucketLong(v.asInstanceOf[Int].toLong, n)
    case LongType | TimestampType | TimestampNTZType =>
      bucketLong(v.asInstanceOf[Long], n)
    case StringType => bucketUTF8(v.asInstanceOf[UTF8String], n)
    case BinaryType => bucketBytes(v.asInstanceOf[Array[Byte]], n)
    case _: DecimalType => bucketDecimal(v.asInstanceOf[Decimal], n)
    case other =>
      throw new UnsupportedOperationException(
        s"iceberg bucket hash unsupported for ${other.catalogString}")
  }
}

/** `iceberg_bucket(v) -> int` over a fixed bucket count — the write
  * path's shuffle key under `graft.bucket.hash=iceberg`. NULL routes
  * to bucket 0 (every row must land in exactly one of the n part
  * files); the mirror refuses to claim bucket tuples for files whose
  * bucket column has nulls, so the null placement never reaches an
  * external reader as a pruning claim. Codegen is a single static
  * call — the expression stays inside whole-stage codegen. */
case class IcebergBucketId(child: Expression, numBuckets: Int)
  extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "iceberg_bucket"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0 else IcebergHash.bucketOf(v, child.dataType, numBuckets)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val cls = "graft.catalog.IcebergHash"
    val call = child.dataType match {
      case ByteType | ShortType | IntegerType | DateType =>
        s"$cls.bucketLong((long) ${c.value}, $numBuckets)"
      case LongType | TimestampType | TimestampNTZType =>
        s"$cls.bucketLong(${c.value}, $numBuckets)"
      case StringType => s"$cls.bucketUTF8(${c.value}, $numBuckets)"
      case BinaryType => s"$cls.bucketBytes(${c.value}, $numBuckets)"
      case _: DecimalType => s"$cls.bucketDecimal(${c.value}, $numBuckets)"
      case other =>
        throw new UnsupportedOperationException(
          s"iceberg bucket hash unsupported for ${other.catalogString}")
    }
    val code =
      code"""
         |${c.code}
         |int ${ev.value} = ${c.isNull} ? 0 : $call;
       """
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** FunctionCatalog face of the Iceberg bucket transform: tables with
  * `graft.bucket.hash=iceberg` report their scan partitioning as
  * `iceberg_bucket_<n>(col)` resolved against THIS definition, so two
  * such tables storage-partition-join with zero shuffle while a mixed
  * join (spark-hash bucket vs iceberg bucket) correctly does NOT
  * co-locate (distinct canonical names). The bucket count lives in
  * the NAME, not an argument: Spark's generic named-transform path
  * keeps every transform argument as a catalyst child, and
  * KeyGroupedPartitioning.satisfies requires every child leaf to be a
  * cluster key — a count literal child would disqualify the reported
  * partitioning and silently re-shuffle every co-located join. Same
  * null→0 placement as the write path. */
final case class IcebergBucketFunction(numBuckets: Int) extends UnboundFunction {
  override def name(): String = s"${IcebergBucketFunction.Prefix}$numBuckets"
  override def description(): String =
    s"${name()}(col): Iceberg-spec murmur3 bucket id (Appendix B hash), $numBuckets buckets"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1,
      s"${name()} expects one value column, got ${inputType.catalogString}")
    val valueType = inputType.fields(0).dataType
    require(IcebergHash.supports(valueType),
      s"iceberg bucket hash unsupported for ${valueType.catalogString}")
    new ScalarFunction[Integer] {
      override def inputTypes(): Array[DataType] = Array(valueType)
      override def resultType(): DataType = IntegerType
      override def name(): String = IcebergBucketFunction.this.name()
      override def canonicalName(): String =
        s"graft.iceberg_bucket($numBuckets, ${valueType.catalogString})"
      override def isResultNullable: Boolean = false
      override def produceResult(input: InternalRow): Integer = {
        val v = input.get(0, valueType)
        Integer.valueOf(
          if (v == null) 0 else IcebergHash.bucketOf(v, valueType, numBuckets))
      }
    }
  }
}

object IcebergBucketFunction {
  val Prefix = "iceberg_bucket_"

  /** Parse `iceberg_bucket_<n>` (loadFunction's dynamic family). */
  def parse(name: String): Option[IcebergBucketFunction] =
    if (name.startsWith(Prefix))
      name.stripPrefix(Prefix).toIntOption.filter(_ > 0).map(IcebergBucketFunction(_))
    else None
}
