package graft.catalog

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** Per-file column range, stored as strings in the metadata JSON and
  * compared under the column's type ordering. `nulls` is the column's
  * null count in the file when the footer recorded one (None on
  * metadata written before null counts existed, or when any chunk left
  * it unset) — used by metadata-only COUNT(col) answering.
  * `hasValues=false` marks a column with zero non-null values in the
  * file: min/max are meaningless placeholders, but the entry still
  * carries the null count and PROVES value predicates cannot match. */
final case class ColumnRange(
    min: String, max: String, nulls: Option[Long] = None, hasValues: Boolean = true)

/** File-level data skipping against per-file min/max statistics — the
  * lakehouse analogue of Iceberg's manifest-level pruning (the
  * reference inherits it from its connector; SURVEY.md §4 marks it our
  * custom-lite scope). Clustered writes (LakehouseTable repartitions by
  * the partition columns per commit) make each file cover a narrow key
  * range, so equality/range predicates eliminate whole files before a
  * single footer is opened — at 100 TB, the difference between listing
  * metadata and touching every object.
  *
  * Semantics: a file is DROPPED only when a pushed filter PROVES no row
  * can match (range disjoint). Unknown filters, missing stats, or
  * non-comparable types keep the file — skipping is an optimization,
  * never a correctness decision.
  */
object FileSkipping {

  /** Unsigned UTF-8 byte order — the ordering parquet uses for its
    * binary min/max statistics. Java's `String.compareTo` (UTF-16 code
    * units) disagrees for strings mixing U+E000..U+FFFF with
    * supplementary characters, so comparing footer bounds with it could
    * skip files that actually contain matching rows. */
  def utf8Compare(a: String, b: String): Int =
    java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Ordering per supported type; None → don't skip on this column.
    * `private[catalog]`: manifest-range merging ([[Manifests]]) folds
    * per-file bounds under the same type ordering. */
  private[catalog] def comparator(dt: DataType): Option[(String, String) => Int] = dt match {
    case ByteType | ShortType | IntegerType | LongType =>
      Some((a, b) => java.lang.Long.compare(a.toLong, b.toLong))
    case FloatType | DoubleType =>
      Some((a, b) => java.lang.Double.compare(a.toDouble, b.toDouble))
    case StringType => Some(utf8Compare)
    case DateType | TimestampType => // stored as epoch numbers
      Some((a, b) => java.lang.Long.compare(a.toLong, b.toLong))
    case _ => None
  }

  /** NaN float/double literals render to None: parquet stats exclude
    * NaN, so footer bounds prove nothing about NaN rows — the file must
    * be kept (None → conservative `true` at every use site). */
  private def lit(v: Any): Option[String] = v match {
    case null => None
    case b: Byte => Some(b.toString)
    case s: Short => Some(s.toString)
    case i: Int => Some(i.toString)
    case l: Long => Some(l.toString)
    case f: Float => if (f.isNaN) None else Some(f.toString)
    case d: Double => if (d.isNaN) None else Some(d.toString)
    case s: String => Some(s)
    case d: java.sql.Date => Some(d.toLocalDate.toEpochDay.toString)
    case t: java.sql.Timestamp =>
      // Full-precision micros: getTime is ms-truncated, the sub-ms part
      // (incl. micros) lives in the nanos field — t.getTime*1000 would
      // drop it and mis-prune on sub-millisecond boundaries.
      val i = t.toInstant
      Some(math.addExact(math.multiplyExact(i.getEpochSecond, 1000000L), i.getNano / 1000L).toString)
    case i: java.time.Instant =>
      Some((i.getEpochSecond * 1000000L + i.getNano / 1000L).toString)
    case d: java.time.LocalDate => Some(d.toEpochDay.toString)
    case _ => None
  }

  /** Can any value in [min,max] satisfy the filter? (conservative) */
  def mayMatch(
      filter: Filter,
      schema: StructType,
      stats: Map[String, ColumnRange]): Boolean = {

    def range(col: String): Option[(ColumnRange, (String, String) => Int)] =
      for {
        r <- stats.get(col) if r.hasValues
        f <- schema.fields.find(_.name == col)
        cmp <- comparator(f.dataType)
      } yield (r, cmp)

    // a column recorded with zero non-null values: no value predicate
    // on it can match any row in this file (NULL op anything ≠ TRUE)
    def allNull(col: String): Boolean = stats.get(col).exists(!_.hasValues)

    filter match {
      case EqualTo(col, v) =>
        if (allNull(col)) false
        else range(col).flatMap { case (r, cmp) =>
          lit(v).map(s => cmp(s, r.min) >= 0 && cmp(s, r.max) <= 0)
        }.getOrElse(true)
      case In(col, vs) =>
        if (allNull(col)) false
        else range(col).flatMap { case (r, cmp) =>
          val ls = vs.toSeq.flatMap(lit(_))
          if (ls.size != vs.length) None
          else Some(ls.exists(s => cmp(s, r.min) >= 0 && cmp(s, r.max) <= 0))
        }.getOrElse(true)
      case GreaterThan(col, v) =>
        if (allNull(col)) false
        else range(col).flatMap { case (r, cmp) => lit(v).map(s => cmp(r.max, s) > 0) }
          .getOrElse(true)
      case GreaterThanOrEqual(col, v) =>
        if (allNull(col)) false
        else range(col).flatMap { case (r, cmp) => lit(v).map(s => cmp(r.max, s) >= 0) }
          .getOrElse(true)
      case LessThan(col, v) =>
        if (allNull(col)) false
        else range(col).flatMap { case (r, cmp) => lit(v).map(s => cmp(r.min, s) < 0) }
          .getOrElse(true)
      case LessThanOrEqual(col, v) =>
        if (allNull(col)) false
        else range(col).flatMap { case (r, cmp) => lit(v).map(s => cmp(r.min, s) <= 0) }
          .getOrElse(true)
      // prefix predicates prune on string ranges: the file may match
      // iff [min, max] overlaps [prefix, prefix⁺) where prefix⁺ bumps
      // the last character — computed only for all-ASCII prefixes
      // (multi-byte increments risk utf8-order subtleties; the lower
      // bound alone still prunes there). The truncate(w, col) hidden
      // transform clusters exactly for this shape.
      case StringStartsWith(col, prefix) =>
        if (allNull(col)) false
        else range(col).map { case (r, cmp) =>
          val upper =
            if (prefix.nonEmpty && prefix.forall(c => c >= ' ' && c < 127))
              Some(prefix.init + (prefix.last + 1).toChar)
            else None
          cmp(r.max, prefix) >= 0 && upper.forall(u => cmp(r.min, u) < 0)
        }.getOrElse(true)
      case IsNotNull(col) => !allNull(col)
      // a recorded null count of 0 proves IS NULL matches nothing here
      case IsNull(col) => !stats.get(col).flatMap(_.nulls).contains(0L)
      case And(l, r) => mayMatch(l, schema, stats) && mayMatch(r, schema, stats)
      case Or(l, r) => mayMatch(l, schema, stats) || mayMatch(r, schema, stats)
      // Not / IsNull / string matches / UDF-ish filters: can't prove absence
      case _ => true
    }
  }

  /** Could a value range `a` share any value with range `b` under the
    * column's type ordering? Conservative: unknown types, missing
    * bounds, or either side lacking values (where a null-key equality
    * could still match) → true. Used by merge-on-read to prove a data
    * file CLEAN of a delete file's keys from footer stats alone. */
  def rangesMayOverlap(dt: DataType, a: ColumnRange, b: ColumnRange): Boolean = {
    // an all-null side can only match the other side's nulls: disjoint
    // exactly when the other side has zero nulls recorded
    if (!a.hasValues) return !b.nulls.contains(0L) || b.nulls.isEmpty
    if (!b.hasValues) return !a.nulls.contains(0L) || a.nulls.isEmpty
    comparator(dt) match {
      case Some(cmp) =>
        val valuesOverlap = cmp(a.min, b.max) <= 0 && cmp(b.min, a.max) <= 0
        // null-safe equality also matches null=null: ranges prove
        // nothing about nulls, so require both sides null-free to
        // declare disjoint
        val bothNullFree = a.nulls.contains(0L) && b.nulls.contains(0L)
        valuesOverlap || !bothNullFree
      case None => true
    }
  }

  /** Types where a recorded min==max PROVES the exact value set of a
    * file. Strings are excluded deliberately: parquet writers may
    * truncate long binary min/max (or drop them past a size
    * threshold), so equal string bounds don't prove every row equals
    * them — conservative pruning is still fine, exactness is not.
    * Float/double are excluded for the same reason MetadataAggregates
    * declines their MIN/MAX: spec-following writers omit NaN from
    * min/max, so a file holding [v, NaN] records min==max==v with
    * nulls=0 and equal bounds do NOT prove every row equals v. */
  private def exactProofType(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType |
        DateType | TimestampType => true
    case _ => false
  }

  /** Does EVERY row of the file provably satisfy `filter`? The dual of
    * [[mayMatch]]: where mayMatch proves absence to skip a file,
    * provesAllMatch proves total coverage so the filter needs no
    * per-row evaluation on this file at all — the basis for exact
    * file-level filter pushdown (a clustered partition column's files
    * carry min==max==value). Value predicates additionally need a
    * recorded zero null count: a null row satisfies no value
    * predicate. Conservative: anything unprovable → false. */
  def provesAllMatch(
      filter: Filter,
      schema: StructType,
      stats: Map[String, ColumnRange]): Boolean = {

    def proof(col: String): Option[(ColumnRange, (String, String) => Int)] =
      for {
        r <- stats.get(col) if r.hasValues && r.nulls.contains(0L)
        f <- schema.fields.find(_.name == col) if exactProofType(f.dataType)
        cmp <- comparator(f.dataType)
      } yield (r, cmp)

    filter match {
      case EqualTo(col, v) =>
        proof(col).exists { case (r, cmp) =>
          lit(v).exists(s => cmp(r.min, r.max) == 0 && cmp(s, r.min) == 0)
        }
      case In(col, vs) =>
        proof(col).exists { case (r, cmp) =>
          cmp(r.min, r.max) == 0 &&
            vs.exists(v => lit(v).exists(s => cmp(s, r.min) == 0))
        }
      case GreaterThan(col, v) =>
        proof(col).exists { case (r, cmp) => lit(v).exists(s => cmp(r.min, s) > 0) }
      case GreaterThanOrEqual(col, v) =>
        proof(col).exists { case (r, cmp) => lit(v).exists(s => cmp(r.min, s) >= 0) }
      case LessThan(col, v) =>
        proof(col).exists { case (r, cmp) => lit(v).exists(s => cmp(r.max, s) < 0) }
      case LessThanOrEqual(col, v) =>
        proof(col).exists { case (r, cmp) => lit(v).exists(s => cmp(r.max, s) <= 0) }
      case IsNotNull(col) => stats.get(col).exists(_.nulls.contains(0L))
      case IsNull(col) => stats.get(col).exists(r => !r.hasValues)
      case And(l, r) =>
        provesAllMatch(l, schema, stats) && provesAllMatch(r, schema, stats)
      case Or(l, r) =>
        provesAllMatch(l, schema, stats) || provesAllMatch(r, schema, stats)
      case _ => false
    }
  }

  /** Can file-level pruning implement `filter` EXACTLY against this
    * snapshot? True iff every file either provably cannot match
    * ([[mayMatch]] false → pruned) or provably fully matches
    * ([[provesAllMatch]] → kept whole). No partially-matching file may
    * exist, so the surviving files' rows ARE the filter's result. */
  def exactlyDecidable(
      files: Seq[String],
      fileStats: Map[String, Map[String, ColumnRange]],
      schema: StructType,
      filter: Filter): Boolean =
    files.forall { f =>
      fileStats.get(f).exists { stats =>
        !mayMatch(filter, schema, stats) || provesAllMatch(filter, schema, stats)
      }
    }

  /** Files surviving all pushed filters. */
  def prune(
      files: Seq[String],
      fileStats: Map[String, Map[String, ColumnRange]],
      schema: StructType,
      filters: Seq[Filter]): Seq[String] =
    if (filters.isEmpty) files
    else files.filter { f =>
      fileStats.get(f) match {
        case None => true // no stats recorded → never skip
        case Some(stats) => filters.forall(mayMatch(_, schema, stats))
      }
    }
}
