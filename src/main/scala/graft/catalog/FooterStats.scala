package graft.catalog

import scala.jdk.CollectionConverters._
import scala.util.Try

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.types._

/** Collects per-file min/max column ranges from parquet FOOTERS at
  * commit time — one metadata read per new file, no data pages touched.
  * Only top-level columns whose Spark type [[FileSkipping]] can compare
  * are recorded; anything else is simply absent (and therefore never
  * skipped on). */
object FooterStats {

  private def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType |
         StringType | DateType | TimestampType => true
    case _ => false
  }

  private def render(v: Any): Option[String] = v match {
    case null => None
    case b: Binary => Try(b.toStringUsingUTF8).toOption
    case n: java.lang.Number => Some(n.toString)
    case other => Some(other.toString)
  }

  /** Everything one footer read yields: the file's row count, the
    * per-column ranges/null counts, and the file's top-level physical
    * fields (name -> parquet primitive type name; non-primitive groups
    * report "GROUP") — so import validation needs no second read. */
  final case class FileFooter(
      rows: Long,
      cols: Map[String, ColumnRange],
      fields: Map[String, String] = Map.empty)

  /** Column ranges for one parquet file (merged across row groups). */
  def collect(conf: Configuration, file: HPath, schema: StructType): Map[String, ColumnRange] =
    collectFull(conf, file, schema).cols

  /** Ranges + row count + null counts for one parquet file — same
    * single footer read as [[collect]]. Null counts are recorded only
    * when EVERY row group sets them (parquet leaves them unset at -1
    * otherwise); a partial sum would under-count and corrupt
    * metadata-only COUNT(col) answers. */
  def collectFull(conf: Configuration, file: HPath, schema: StructType): FileFooter = {
    val wanted = schema.fields.filter(f => supported(f.dataType)).map(_.name).toSet
    val reader = ParquetFileReader.open(conf, file)
    try {
      val nullable = schema.fields.map(_.name).toSet
      var rows = 0L
      val nulls = scala.collection.mutable.Map[String, Option[Long]]()
      val acc = scala.collection.mutable.Map[String, (String, String, (String, String) => Int)]()
      val cmpFor: String => (String, String) => Int = col =>
        schema.fields.find(_.name == col).map(_.dataType) match {
          // unsigned UTF-8 byte order — parquet's binary stats ordering
          case Some(StringType) => FileSkipping.utf8Compare
          case Some(FloatType) | Some(DoubleType) =>
            (a, b) => java.lang.Double.compare(a.toDouble, b.toDouble)
          case _ => (a, b) => java.lang.Long.compare(a.toLong, b.toLong)
        }
      reader.getFooter.getBlocks.asScala.foreach { block =>
        rows += block.getRowCount
        block.getColumns.asScala.foreach { chunk =>
          val col = chunk.getPath.toDotString
          val st = chunk.getStatistics
          // null counts: tracked for every top-level column, merged to
          // None the moment any row group leaves them unset
          if (nullable.contains(col)) {
            val chunkNulls =
              if (st != null && !st.isEmpty && st.isNumNullsSet) Some(st.getNumNulls)
              else None
            nulls(col) = (nulls.getOrElse(col, Some(0L)), chunkNulls) match {
              case (Some(a), Some(b)) => Some(a + b)
              case _ => None
            }
          }
          if (wanted.contains(col) && st != null && !st.isEmpty && st.hasNonNullValue) {
            for {
              mn <- render(st.genericGetMin())
              mx <- render(st.genericGetMax())
            } {
              val cmp = cmpFor(col)
              acc.get(col) match {
                case Some((omn, omx, _)) =>
                  acc(col) = (
                    if (cmp(mn, omn) < 0) mn else omn,
                    if (cmp(mx, omx) > 0) mx else omx,
                    cmp)
                case None => acc(col) = (mn, mx, cmp)
              }
            }
          }
        }
      }
      val ranged = acc.map { case (c, (mn, mx, _)) =>
        c -> ColumnRange(mn, mx, nulls.getOrElse(c, None))
      }.toMap
      // columns with zero non-null values still get an entry: it
      // carries the null count (COUNT answering) and proves value
      // predicates and MIN/MAX contributions are impossible
      val allNull = nulls.collect {
        case (c, Some(n)) if n == rows && rows > 0 && !ranged.contains(c) =>
          c -> ColumnRange("", "", Some(n), hasValues = false)
      }
      val fields = reader.getFooter.getFileMetaData.getSchema.getFields.asScala.map { f =>
        f.getName -> (if (f.isPrimitive) f.asPrimitiveType().getPrimitiveTypeName.name
                      else "GROUP")
      }.toMap
      FileFooter(rows, ranged ++ allNull, fields)
    } finally reader.close()
  }
}
