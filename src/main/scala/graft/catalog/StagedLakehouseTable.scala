package graft.catalog

import java.nio.file.{Files, Path}
import java.util.UUID
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.catalog.{StagedTable, SupportsWrite, TableCapability}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType

/** Atomic CTAS / RTAS staging: the SELECT's output lands as data files
  * under the table directory while the table metadata stays unpublished;
  * `commitStagedChanges` then makes the whole statement visible with the
  * one metadata swap every other commit uses. A failed or aborted CTAS
  * leaves no table (and a failed RTAS leaves the old version current) —
  * the same all-or-nothing contract Iceberg gives `REPLACE TABLE AS
  * SELECT`. Data-before-metadata is already this catalog's write order,
  * so staging defers exactly one step: the publish.
  *
  * `priorSnapshots` carries the replaced table's history on RTAS (the
  * old versions stay time-travelable; `replace` is just the next
  * snapshot); empty for CTAS.
  */
class StagedLakehouseTable(
    spark: SparkSession,
    identName: String,
    dir: Path,
    version: Int,
    stagedSchema: StructType,
    partitionColumns: Seq[String],
    tableProperties: Map[String, String],
    priorSnapshots: Seq[Snapshot],
    op: String)
  extends StagedTable with SupportsWrite {

  private val bucketSpec = Bucketing.specOf(tableProperties)
  private val commitRel =
    if (bucketSpec.isDefined) s"data/b-$op$version-${UUID.randomUUID().toString.take(8)}"
    else s"data/c$version-$op-${UUID.randomUUID().toString.take(8)}"
  private val commitDir = dir.resolve(commitRel)
  @volatile private var written: Seq[String] = Seq.empty
  @volatile private var writtenStats: Map[String, Map[String, ColumnRange]] = Map.empty
  @volatile private var writtenRows: Map[String, Long] = Map.empty

  override def name(): String = identName
  override def schema(): StructType = stagedSchema
  override def properties(): java.util.Map[String, String] = tableProperties.asJava
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      // the staged table is empty by construction; truncate-then-write
      // (RTAS plans an overwrite) is the same as write
      override def truncate(): WriteBuilder = this
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(rawData: DataFrame, overwrite: Boolean): Unit = {
              // CTAS/RTAS are new-row writes like any INSERT: generated
              // columns compute here and CHECK constraints guard the
              // result — `CREATE TABLE ... AS SELECT` cannot smuggle a
              // violating row past a constraint declared in the same DDL
              val data = CheckConstraints.enforce(
                GeneratedColumns.compute(rawData, stagedSchema, tableProperties),
                tableProperties)
              val clustered = bucketSpec match {
                case Some((bcol, n)) =>
                  // the one bucket-layout writer: honors graft.bucket.hash
                  // (a plain Spark repartition here would write b- files
                  // whose index is the WRONG hash's bucket id)
                  Bucketing.cluster(data, bcol, n, tableProperties)
                case None if partitionColumns.nonEmpty =>
                  val cols = partitionColumns.map(data.col)
                  data.repartition(cols: _*).sortWithinPartitions(cols: _*)
                case None => data
              }
              SessionConf.writeMicrosParquet(clustered, commitDir.toString)
              val staged = Fs.children(commitDir).iterator
                .map(_.getFileName.toString)
                .filter(_.endsWith(".parquet"))
                .map(n => s"$commitRel/$n")
                .toSeq.sorted
              val conf = spark.sessionState.newHadoopConf()
              val stagedFooters = staged.map { f =>
                f -> FooterStats.collectFull(
                  conf, new org.apache.hadoop.fs.Path(dir.resolve(f).toString), stagedSchema)
              }.toMap
              val (live, footers) =
                Maintenance.dropEmptyFiles(dir, staged, stagedFooters)
              written = live
              writtenStats = footers.view.mapValues(_.cols).filter(_._2.nonEmpty).toMap
              writtenRows = footers.view.mapValues(_.rows).toMap
            }
          }
      }
    }

  override def commitStagedChanges(): Unit =
    TableMetadata.commit(dir, TableMetadata(
      version = version,
      name = identName.split('.').last,
      schema = stagedSchema,
      partitionColumns = partitionColumns,
      properties = tableProperties,
      files = written,
      fileStats = writtenStats,
      fileRows = writtenRows,
      snapshots = priorSnapshots :+ Snapshot(
        version, System.currentTimeMillis(), op, written.size, written.size)))

  override def abortStagedChanges(): Unit = {
    if (Files.isDirectory(commitDir)) {
      Fs.deleteRecursively(commitDir)
    }
    // a staged CREATE owns the whole directory (no published metadata
    // yet); a staged REPLACE must leave the live table untouched
    if (op == "create" && !TableMetadata.exists(dir) && Files.isDirectory(dir)) {
      Fs.deleteRecursively(dir)
    }
  }
}
