package graft.catalog

import java.nio.file.{Files, Path}
import java.util.UUID
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A lakehouse table: a directory of immutable Parquet data files plus a
  * JSON metadata/snapshot log (see [[TableMetadata]]).
  *
  * Read path delegates to Spark's own DSv2 Parquet table over the
  * current snapshot's file list, so vectorized reads, filter pushdown,
  * column pruning and row-group skipping are all inherited, not
  * re-implemented (the same move the reference makes by delegating its
  * scans to Spark+Iceberg, `SURVEY.md` §4).
  *
  * Write path is a V1 fallback: Spark resolves and ANSI-casts the input
  * to the table schema (the reference's observable double→FLOAT /
  * int→FLOAT coercion, `pyspark_jobs/iceberg_table_creation.py:81-85`),
  * then `insert` lands Parquet files in a fresh per-commit directory and
  * publishes them with an atomic metadata swap. Files are never
  * rewritten in place, so concurrent readers keep a consistent snapshot
  * — the property that matters once a table is 100 TB and always being
  * read.
  */
class LakehouseTable(
    spark: SparkSession,
    identName: String,
    val tableDir: Path,
    val meta: TableMetadata)
  extends Table with SupportsRead with SupportsWrite {

  override def name(): String = identName

  override def schema(): StructType = meta.schema

  override def properties(): java.util.Map[String, String] = meta.properties.asJava

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE)

  private def absoluteFiles: Seq[String] =
    meta.files.map(f => tableDir.resolve(f).toString)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    ParquetTable(identName, spark, options, absoluteFiles,
      Some(meta.schema), classOf[ParquetFileFormat])
      .newScanBuilder(options)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var overwrite = false
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwriteParam: Boolean): Unit =
              commitInsert(data, overwrite || overwriteParam)
          }
      }
    }

  private def commitInsert(data: DataFrame, overwrite: Boolean): Unit = {
    val current = TableMetadata.load(tableDir) // re-read: optimistic concurrency
    val nextVersion = current.version + 1
    val commitRel = s"data/c$nextVersion-${UUID.randomUUID().toString.take(8)}"
    val commitDir = tableDir.resolve(commitRel)

    // Cluster by the declared partition columns so each file covers a
    // narrow key range; Parquet min/max stats then let pushed-down
    // filters skip whole files/row groups on read.
    val clustered =
      if (current.partitionColumns.nonEmpty) {
        val cols = current.partitionColumns.map(data.col)
        data.repartition(cols: _*).sortWithinPartitions(cols: _*)
      } else data
    clustered.write.parquet(commitDir.toString)

    val newFiles = Files.list(commitDir).iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.endsWith(".parquet"))
      .map(n => s"$commitRel/$n")
      .toSeq.sorted
    val allFiles = if (overwrite) newFiles else current.files ++ newFiles
    val op = if (overwrite) "overwrite" else "append"
    TableMetadata.commit(tableDir, current.copy(
      version = nextVersion,
      files = allFiles,
      snapshots = current.snapshots :+ Snapshot(
        nextVersion, System.currentTimeMillis(), op, newFiles.size, allFiles.size)))
  }
}
