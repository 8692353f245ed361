package graft.catalog

import java.nio.file.Path

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Scan variant that serves the [[LakehouseTable.RowIdColName]] metadata
  * column: each row carries `struct(file, pos)` — its table-relative
  * data file and 0-based row offset — the row identity the delta
  * (merge-on-read) MERGE/UPDATE/DELETE writes into POSITIONAL delete
  * entries (and a user-queryable introspection column, the same shape
  * as Iceberg's `_file`/`_pos`).
  *
  * Exactness under pushdown: the row offset comes from Spark's own
  * parquet row-index generation (a read-schema field named
  * `ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME` is populated by
  * the reader with the row's FILE-GLOBAL ordinal), which accounts for
  * row-group skipping and split boundaries — so predicate pushdown
  * stays fully enabled and a selective MERGE reads only the row groups
  * its ON keys admit. File attribution needs one file per input
  * partition: the delegate's planned partitions are re-grouped per
  * `PartitionedFile` (split granularity is preserved, so one 10 GB
  * file still reads as parallel row-group splits; only multi-FILE
  * coalescing is given up, irrelevant at target file sizes).
  */
private[catalog] class PositionalRowIdScan(
    spark: SparkSession,
    identName: String,
    tableDir: Path,
    meta: TableMetadata,
    required: StructType,
    pushed: Array[sources.Filter],
    options: CaseInsensitiveStringMap)
  extends Scan {

  private def abs(f: String): String = tableDir.resolve(f).toString

  override def readSchema(): StructType = required
  override def description(): String = s"lakehouse-positional-rowid-scan $identName"

  override def toBatch: Batch = new Batch {
    private val dataRequired = StructType(
      required.fields.filterNot(_.name == LakehouseTable.RowIdColName))
    // the reader special-cases this exact NAME (ParquetRowIndexUtil
    // matches on ROW_INDEX_TEMPORARY_COLUMN_NAME; ROW_INDEX_FIELD is
    // the _metadata struct's inner field, not the flat temp column)
    private val rowIdxField = org.apache.spark.sql.types.StructField(
      ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME,
      org.apache.spark.sql.types.LongType)
    private val delegateRequired = StructType(dataRequired.fields :+ rowIdxField)

    private val survivors = {
      val ranged = FileSkipping.prune(meta.files, meta.fileStats, meta.schema, pushed.toSeq)
      BloomIndex.prune(tableDir, meta.properties, meta.schema, ranged, pushed.toSeq)
    }

    private val delegateScan: Scan = {
      val inner = ParquetTable(identName, spark, options, survivors.map(abs),
        Some(StructType(meta.schema.fields :+ rowIdxField)), classOf[ParquetFileFormat])
        .newScanBuilder(options)
      inner.pushDataFilters(pushed)
      inner.pruneColumns(delegateRequired)
      inner.build()
    }
    private val delegate: Batch = delegateScan.toBatch

    /** required-order output plan: data columns by delegate index, the
      * row-id struct marked -1; computed against the delegate's ACTUAL
      * read schema, not an assumed order. */
    private val (outPlan: Array[Int], outTypes: Array[DataType], rowIdxIdx: Int) = {
      val delSchema = delegateScan.readSchema()
      val idxOf = delSchema.fieldNames.zipWithIndex.toMap
      val plan = required.fields.map { f =>
        if (f.name == LakehouseTable.RowIdColName) -1
        else idxOf.getOrElse(f.name, throw new IllegalStateException(
          s"positional scan delegate lost column ${f.name} (has: ${
            delSchema.fieldNames.mkString(", ")})"))
      }
      (plan, delSchema.fields.map(_.dataType): Array[DataType],
        idxOf.getOrElse(rowIdxField.name, throw new IllegalStateException(
          "parquet delegate dropped the row-index generation column")))
    }

    override def planInputPartitions(): Array[InputPartition] = {
      // one FILE per partition (splits preserved) so the reader knows
      // each row's source file without per-row file tracking
      val relByAbs = survivors.map(f => abs(f) -> f).toMap
      delegate.planInputPartitions().flatMap {
        case fp: FilePartition =>
          fp.files.map { pf =>
            val a = pf.filePath.toString
            PosRowIdPartition(
              FilePartition(0, Array(pf)),
              relByAbs.getOrElse(a,
                // delegate paths can come back URI-encoded (file:...)
                relByAbs.find { case (k, _) => a.endsWith(k) || k.endsWith(a) }
                  .map(_._2).getOrElse(throw new IllegalStateException(
                    s"cannot relativize scanned file $a"))))
          }
        case other => Array(PosRowIdPartition(other, null)) // non-file partition: impossible for parquet
      }.zipWithIndex.map { case (p, i) => p.copy(index = i) }
        .toArray[InputPartition]
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new PosRowIdReaderFactory(delegate.createReaderFactory(), outPlan, outTypes, rowIdxIdx)
  }
}

private case class PosRowIdPartition(
    inner: InputPartition, relPath: String, index: Int = 0) extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

private class PosRowIdReaderFactory(
    innerFactory: PartitionReaderFactory,
    outPlan: Array[Int],
    outTypes: Array[DataType],
    rowIdxIdx: Int)
  extends PartitionReaderFactory {

  // the wrapper assembles rows, so the scan is row-based; the delegate
  // still decodes parquet vectorized internally when enabled
  override def supportColumnarReads(partition: InputPartition): Boolean = false

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PosRowIdPartition]
    val inner = innerFactory.createReader(p.inner)
    val file = UTF8String.fromString(p.relPath)
    new PartitionReader[InternalRow] {
      private val out = new GenericInternalRow(outPlan.length)
      override def next(): Boolean = inner.next()
      override def get(): InternalRow = {
        val row = inner.get()
        var i = 0
        while (i < outPlan.length) {
          val src = outPlan(i)
          if (src >= 0) out.update(i, if (row.isNullAt(src)) null else row.get(src, outTypes(src)))
          else out.update(i, new GenericInternalRow(
            Array[Any](file, row.getLong(rowIdxIdx))))
          i += 1
        }
        out
      }
      override def close(): Unit = inner.close()
    }
  }
}
