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

  /** Opt-in hash selection: `graft.bucket.hash=iceberg` lays buckets
    * out with Iceberg's published bucket hash ([[IcebergHash]]) instead
    * of Spark's murmur3(seed=42). Same zero-shuffle storage-partitioned
    * join (the scan reports `iceberg_bucket(n, col)` resolved against
    * [[IcebergBucketFunction]]) — but the layout is now expressible as
    * a REAL Iceberg partition spec, so the mirror exports `bucket[n]`
    * with per-file tuples and external engines regain bucket pruning
    * on exactly the co-located join tables. */
  val HashProp = "graft.bucket.hash"

  /** The properties that define the physical bucket layout — immutable
    * once data files exist (enforced by ALTER TABLE). */
  val LayoutProps: Set[String] = Set(ColProp, CountProp, HashProp)

  def specOf(properties: Map[String, String]): Option[(String, Int)] =
    for { c <- properties.get(ColProp); n <- properties.get(CountProp) } yield (c, n.toInt)

  def icebergHash(properties: Map[String, String]): Boolean =
    properties.get(HashProp).contains("iceberg")

  /** Fail at CREATE, not first write: the hash property must name a
    * known hash, and iceberg mode needs a bucket column type the
    * published hash defines (Appendix B's encodings). */
  def validate(schema: StructType, properties: Map[String, String]): Unit = {
    properties.get(HashProp).foreach { h =>
      require(h == "iceberg" || h == "spark",
        s"unknown $HashProp '$h' (expected 'iceberg' or 'spark')")
    }
    if (icebergHash(properties)) specOf(properties) match {
      case None =>
        throw new IllegalArgumentException(
          s"$HashProp=iceberg requires a bucket(n, col) partition transform")
      case Some((c, _)) =>
        val f = schema.fields.find(_.name.equalsIgnoreCase(c)).getOrElse(
          throw new IllegalArgumentException(s"no such bucket column: $c"))
        require(IcebergHash.supports(f.dataType),
          s"$HashProp=iceberg unsupported for ${f.dataType.catalogString} bucket column $c")
    }
  }

  /** CREATE-time notice for a silent trap: `bucket(n, col)` WITHOUT
    * `graft.bucket.hash=iceberg` freezes a Spark-murmur3 layout that
    * external engines can never bucket-prune — and layout props are
    * immutable once data exists, so the choice is forever. Returned for
    * the catalog to log once at CREATE; None when the layout is
    * exportable, unbucketed, or the bucket column's type has no
    * published-hash encoding (no opt-in was ever possible). */
  def layoutNotice(schema: StructType, properties: Map[String, String]): Option[String] =
    specOf(properties) match {
      case Some((c, n)) if !icebergHash(properties) &&
          schema.fields.find(_.name.equalsIgnoreCase(c))
            .exists(f => IcebergHash.supports(f.dataType)) =>
        Some(s"bucket($n, $c) uses Spark's hash: the mirror exports an " +
          "UNPARTITIONED spec and external engines can never bucket-prune " +
          "this table (the layout freezes once data exists). Add " +
          "TBLPROPERTIES ('graft.bucket.hash'='iceberg') at CREATE to keep " +
          "external pruning and cross-engine storage-partitioned joins.")
      case _ => None
    }

  /** For each target partition t in [0, n): the smallest non-negative
    * int token whose SPARK shuffle placement is t — i.e.
    * `pmod(murmur3(token, 42), n) == t`. Lets the write path reuse
    * Spark's stock hash shuffle to realize an ARBITRARY computed
    * bucket id: repartition(n, lit_array[computed_id]) lands each row
    * in partition computed_id, entirely inside Tungsten/codegen (no
    * RDD custom-partitioner detour). Tokens are dense small ints —
    * for any n, murmur3 over 0,1,2,… covers all residues quickly. */
  def sparkHashTokens(n: Int): Array[Int] = {
    val out = Array.fill(n)(-1)
    var found = 0
    var v = 0
    while (found < n) {
      val h = Murmur3HashFunction.hash(v, IntegerType, 42L).toInt
      val b = ((h % n) + n) % n
      if (out(b) < 0) { out(b) = v; found += 1 }
      v += 1
    }
    out
  }

  /** Cluster `df` so part-file index = the table's bucket id under its
    * DECLARED hash — the one bucket-layout writer, shared by the insert
    * path, compaction, and column-rename rewrites. A rewrite that used
    * the wrong hash would silently relabel every file: scans would
    * report a KeyGroupedPartitioning the physical layout doesn't have
    * (wrong storage-partitioned joins) and the mirror would export
    * wrong bucket tuples (wrong external pruning). */
  def cluster(
      df: org.apache.spark.sql.DataFrame, bcol: String, n: Int,
      properties: Map[String, String]): org.apache.spark.sql.DataFrame =
    if (icebergHash(properties)) {
      // iceberg bucket id routed through tokens that Spark-hash to the
      // same partition index — stock Tungsten shuffle, see sparkHashTokens
      import org.apache.spark.sql.functions.{element_at, lit, typedlit}
      val ib = org.apache.spark.sql.graftbridge.ColumnBridge.column(
        IcebergBucketId(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(df.col(bcol)), n))
      val route = element_at(typedlit(sparkHashTokens(n).toSeq), ib + lit(1))
      df.repartition(n, route).sortWithinPartitions(df.col(bcol))
    } else df.repartition(n, df.col(bcol)).sortWithinPartitions(df.col(bcol))

  /** Metadata-only bucket pruning: an equality (or IN) predicate on the
    * bucket column keeps only the matching bucket's files — a point
    * lookup on a 100 TB bucketed table drops (n-1)/n of its files
    * before any footer or bloom sidecar opens. Hash-clustered files
    * have WIDE min/max ranges (hashing scatters the value domain), so
    * range skipping never helps exactly here — this is the skipping
    * layer a bucket layout actually admits. Only bucket-addressable
    * files (`b-` commits) are ever skipped; rewrite-era files always
    * survive. NULL literals (EqualNullSafe) route to each hash's null
    * placement: pmod(seed 42, n) for spark hash, bucket 0 for iceberg. */
  def pruneByBucket(
      files: Seq[String],
      properties: Map[String, String],
      schema: StructType,
      filters: Seq[org.apache.spark.sql.sources.Filter]): Seq[String] =
    specOf(properties) match {
      case None => files
      case Some((bcol, n)) =>
        val field = schema.fields.find(_.name.equalsIgnoreCase(bcol))
        if (field.isEmpty) return files
        val dt = field.get.dataType
        val toCatalyst =
          org.apache.spark.sql.catalyst.CatalystTypeConverters.createToCatalystConverter(dt)
        val iceberg = icebergHash(properties)
        def bucketOf(v: Any): Option[Int] =
          try {
            if (v == null)
              Some(if (iceberg) 0 else ((42 % n) + n) % n)
            else if (iceberg) Some(IcebergHash.bucketOf(toCatalyst(v), dt, n))
            else {
              val h = Murmur3HashFunction.hash(toCatalyst(v), dt, 42L).toInt
              Some(((h % n) + n) % n)
            }
          } catch { case scala.util.control.NonFatal(_) => None }
        import org.apache.spark.sql.sources._
        // conjunctive filters: each applicable one yields a wanted-bucket
        // set; the intersection is what can match
        val sets: Seq[Set[Int]] = filters.flatMap {
          case EqualTo(c, v) if c.equalsIgnoreCase(bcol) && v != null =>
            bucketOf(v).map(Set(_))
          case EqualNullSafe(c, v) if c.equalsIgnoreCase(bcol) =>
            bucketOf(v).map(Set(_))
          case In(c, vs) if c.equalsIgnoreCase(bcol) =>
            val bs = vs.toSeq.map(bucketOf)
            if (bs.forall(_.isDefined)) Some(bs.flatten.toSet) else None
          case _ => None
        }
        if (sets.isEmpty) files
        else {
          val wanted = sets.reduce(_ intersect _)
          files.filter(f => bucketIdOf(f) match {
            case Some(b) => wanted.contains(b)
            case None => true // not bucket-addressable: never skip
          })
        }
    }

  /** Bucket id of a data file, IF the file was written by a bucketed
    * commit (commit dir prefixed `b-`): the part-file index equals the
    * shuffle partition = bucket id. Files from non-bucketed commits
    * (rewrites, pre-bucketing history) return None and disable
    * bucket-aware planning for the snapshot — correct, just unplanned.
    * Hand-parsed, no regex: this runs once per FILE per scan
    * (bucket-aware planning + bucket pruning), and at 200k files the
    * regex version cost ~165 ms of driver time per scan (BENCH_META)
    * — this form is ~10×-20× cheaper. */
  def bucketIdOf(relPath: String): Option[Int] = {
    if (!relPath.startsWith("data/b-")) return None
    // the part-file pattern: part-<digits>-... (same shape the regex
    // `.*part-(\d+)-.*` accepted on these writer-generated names);
    // scanned in place, no per-file substring allocation
    val start = relPath.lastIndexOf('/') + 1
    if (!relPath.startsWith("part-", start)) return None
    var i = start + 5
    var v = 0
    var digits = 0
    while (i < relPath.length && digits < 9 &&
           relPath.charAt(i) >= '0' && relPath.charAt(i) <= '9') {
      v = v * 10 + (relPath.charAt(i) - '0')
      digits += 1
      i += 1
    }
    if (digits == 0 || i >= relPath.length || relPath.charAt(i) != '-') None
    else Some(v)
  }

  def partitionKey(bucket: Int): InternalRow =
    new GenericInternalRow(Array[Any](bucket))
}
