package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, Murmur3HashFunction}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}

/** Hash-bucketing for co-located (storage-partitioned) joins.
  *
  * A table created `PARTITIONED BY (bucket(n, k))` clusters every
  * append through `repartition(n, k)` — Spark's own HashPartitioning,
  * `pmod(murmur3(k, seed=42), n)` — so output file `part-i` holds
  * exactly bucket i's rows. The scan then reports
  * `KeyGroupedPartitioning(bucket(n, k), n)` and plans one input
  * partition per bucket; when two tables share the spec, Spark's
  * storage-partitioned join matches buckets directly and the join runs
  * with ZERO shuffle on either side — at 100 TB, the difference between
  * re-shuffling both fact tables on every join and reading them
  * co-located (the same contract Iceberg's bucket transform + its
  * function catalog provide).
  *
  * [[BucketFunction]] is the FunctionCatalog-visible definition Spark
  * resolves the transform against; its `produceResult` reproduces the
  * physical layout's hash EXACTLY (same murmur3, same seed, same pmod),
  * which is what makes it safe for Spark to reason about — and, with
  * `spark.sql.sources.v2.bucketing.shuffle.enabled`, to shuffle a
  * non-bucketed join side INTO this bucketing.
  */
object BucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col): murmur3-hash bucket id, identical to Spark HashPartitioning"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket expects (numBuckets, value), got ${inputType.catalogString}")
    val valueType = inputType.fields(1).dataType
    new ScalarFunction[Integer] {
      override def inputTypes(): Array[DataType] = Array(IntegerType, valueType)
      override def resultType(): DataType = IntegerType
      override def name(): String = "bucket"
      override def canonicalName(): String = s"graft.bucket(${valueType.catalogString})"
      override def isResultNullable: Boolean = false
      override def produceResult(input: InternalRow): Integer = {
        val n = input.getInt(0)
        val v = input.get(1, valueType)
        // null key: Murmur3Hash skips null children, leaving the seed —
        // HashPartitioning therefore lands null rows in bucket pmod(42, n)
        val h = if (v == null) 42 else Murmur3HashFunction.hash(v, valueType, 42L).toInt
        Integer.valueOf(((h % n) + n) % n)
      }
    }
  }
}

object Bucketing {
  /** Property keys carrying the bucket spec (no metadata-format change). */
  val ColProp = "graft.bucket.column"
  val CountProp = "graft.bucket.count"

  def specOf(properties: Map[String, String]): Option[(String, Int)] =
    for { c <- properties.get(ColProp); n <- properties.get(CountProp) } yield (c, n.toInt)

  /** Bucket id of a data file, IF the file was written by a bucketed
    * commit (commit dir prefixed `b-`): the part-file index equals the
    * shuffle partition = bucket id. Files from non-bucketed commits
    * (rewrites, pre-bucketing history) return None and disable
    * bucket-aware planning for the snapshot — correct, just unplanned. */
  private val PartIdx = ".*part-(\\d+)-.*".r

  def bucketIdOf(relPath: String): Option[Int] = {
    val dirOk = relPath.startsWith("data/b-")
    if (!dirOk) None
    else relPath.substring(relPath.lastIndexOf('/') + 1) match {
      case PartIdx(i) => Some(i.toInt)
      case _ => None
    }
  }

  def partitionKey(bucket: Int): InternalRow =
    new GenericInternalRow(Array[Any](bucket))
}
