package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Answers pushed-down GLOBAL aggregates from snapshot metadata alone.
  *
  * `SELECT count(*) FROM t` on a 100 TB lakehouse table is a driver-side
  * sum of per-file row counts — zero tasks, zero bytes of data read
  * (the capability Iceberg/Delta get from their manifests; the
  * reference's connector inherits it the same way). MIN/MAX fold the
  * per-file ranges [[FooterStats]] records at commit time; COUNT(col)
  * folds rows − nulls.
  *
  * Declines (returns None → ordinary scan) whenever metadata cannot
  * prove the exact answer:
  *  - any group-by, DISTINCT, or a non-count/min/max aggregate;
  *  - a file with no recorded row count (metadata predating this
  *    feature — counts are write-time, never backfilled);
  *  - MIN/MAX on float/double (NaN makes parquet footer ranges
  *    untrustworthy), on types footers don't record, or on a file
  *    whose range is missing while rows might be non-null;
  *  - COUNT(col) where any file lacks an exact null count.
  * Files are immutable and never share names across commits, so a
  * recorded count can never be stale — missing means unknown, present
  * means exact.
  */
object MetadataAggregates {

  /** (output schema, single result row) when every aggregate in `agg`
    * is answerable exactly from `meta`; None otherwise. */
  def answer(meta: TableMetadata, agg: Aggregation): Option[(StructType, InternalRow)] = {
    if (agg.groupByExpressions.nonEmpty) return None
    val resolved = agg.aggregateExpressions.toSeq.map {
      case _: CountStar =>
        countStar(meta).map(n => (StructField("count(*)", LongType, nullable = false),
          n.asInstanceOf[Any]))
      case c: Count if !c.isDistinct =>
        columnOf(c.column).flatMap(countCol(meta, _)).map(n =>
          (StructField(s"count(${c.column.describe})", LongType, nullable = false),
            n.asInstanceOf[Any]))
      case m: Min =>
        columnOf(m.column).flatMap(foldRange(meta, _, wantMin = true)).map {
          case (dt, v) => (StructField(s"min(${m.column.describe})", dt, nullable = true), v)
        }
      case m: Max =>
        columnOf(m.column).flatMap(foldRange(meta, _, wantMin = false)).map {
          case (dt, v) => (StructField(s"max(${m.column.describe})", dt, nullable = true), v)
        }
      case _ => None
    }
    if (resolved.exists(_.isEmpty)) None
    else {
      val fields = resolved.map(_.get)
      Some((StructType(fields.map(_._1)),
        new GenericInternalRow(fields.map(_._2).toArray)))
    }
  }

  /** Top-level column name for a single-part field reference. */
  private def columnOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
    e match {
      case r: NamedReference if r.fieldNames.length == 1 => Some(r.fieldNames.head)
      case _ => None
    }

  private def countStar(meta: TableMetadata): Option[Long] =
    if (meta.files.forall(meta.fileRows.contains))
      Some(meta.files.map(meta.fileRows).sum)
    else None

  private def countCol(meta: TableMetadata, col: String): Option[Long] = {
    val field = meta.schema.fields.find(_.name.equalsIgnoreCase(col)).getOrElse(return None)
    val perFile = meta.files.map { f =>
      for {
        rows <- meta.fileRows.get(f)
        nulls <-
          if (rows == 0L) Some(0L)
          else meta.fileStats.get(f).flatMap(_.get(field.name)).flatMap(_.nulls)
      } yield rows - nulls
    }
    if (perFile.forall(_.isDefined)) Some(perFile.map(_.get).sum) else None
  }

  /** Fold per-file ranges to a global min or max, typed for an
    * InternalRow slot. None = not answerable; Some((dt, null)) = the
    * column has no non-null values in any live file. */
  private def foldRange(
      meta: TableMetadata, col: String, wantMin: Boolean): Option[(DataType, Any)] = {
    val field = meta.schema.fields.find(_.name.equalsIgnoreCase(col)).getOrElse(return None)
    val dt = field.dataType
    val ordered: Option[(String, String) => Int] = dt match {
      case StringType => Some(FileSkipping.utf8Compare)
      case ByteType | ShortType | IntegerType | LongType | DateType | TimestampType =>
        Some((a, b) => java.lang.Long.compare(a.toLong, b.toLong))
      // float/double excluded: NaN poisons parquet footer ordering
      case _ => None
    }
    val cmp = ordered.getOrElse(return None)

    // each live file must either contribute a range or be PROVEN empty
    // of non-null values for this column (0 rows, or nulls == rows)
    var best: Option[String] = None
    meta.files.foreach { f =>
      meta.fileStats.get(f).flatMap(_.get(field.name)) match {
        case Some(r) if !r.hasValues => () // provably no non-null values here
        case Some(r) =>
          val v = if (wantMin) r.min else r.max
          best = best match {
            case None => Some(v)
            case Some(b) =>
              if (wantMin) Some(if (cmp(v, b) < 0) v else b)
              else Some(if (cmp(v, b) > 0) v else b)
          }
        case None =>
          // no recorded range: only a provably row-free file contributes
          // nothing; otherwise the rows might hold unseen values
          if (!meta.fileRows.get(f).contains(0L)) return None
      }
    }
    Some((dt, best.map(parse(dt, _)).orNull))
  }

  private def parse(dt: DataType, s: String): Any = dt match {
    case ByteType => s.toLong.toByte
    case ShortType => s.toLong.toShort
    case IntegerType | DateType => s.toLong.toInt
    case LongType | TimestampType => s.toLong
    case StringType => UTF8String.fromString(s)
    case other => throw new IllegalStateException(s"unreachable: $other")
  }
}
