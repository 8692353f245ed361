package graft.catalog

import java.nio.file.{Files, Path}
import java.util.UUID
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}

/** Table maintenance: compaction and snapshot-retention vacuum.
  *
  * Streaming ingest and frequent small INSERTs leave a table with many
  * small files (one-plus per commit); scans then pay per-file open
  * cost and lose row-group parallelism. Compaction rewrites the
  * CURRENT snapshot into a few well-sized files as a new snapshot —
  * readers of older versions are untouched (files are immutable), and
  * a concurrent writer loses the version race cleanly rather than
  * silently interleaving. Vacuum then deletes data files no longer
  * referenced by any retained snapshot version.
  */
object Maintenance {

  private def lakehouseTable(
      spark: SparkSession, catalog: String, namespace: Seq[String], table: String): LakehouseTable = {
    val cat = spark.sessionState.catalogManager.catalog(catalog).asInstanceOf[TableCatalog]
    cat.loadTable(Identifier.of(namespace.toArray, table)).asInstanceOf[LakehouseTable]
  }

  /** Rewrite the current snapshot's data into ≤ `targetFiles` files.
    * No-op if the table already has that few (unless `clusterBy` asks
    * for a re-layout). Returns new file count.
    *
    * `clusterBy` re-clusters the data by OTHER columns than the
    * partition key (Delta's `OPTIMIZE ZORDER BY` analogue, linear
    * order): `repartitionByRange` gives each output file a DISJOINT
    * range of the cluster columns, so the per-file min/max stats
    * recorded at commit turn filters on those columns into whole-file
    * skips — the way a 100 TB table serves selective predicates on a
    * second dimension without a second copy. */
  def compact(
      spark: SparkSession,
      catalog: String,
      namespace: Seq[String],
      table: String,
      targetFiles: Int = 1,
      clusterBy: Seq[String] = Nil): Int = {
    val lt = lakehouseTable(spark, catalog, namespace, table)
    val dir = lt.tableDir
    val current = TableMetadata.load(dir)
    if (clusterBy.isEmpty && current.files.size <= targetFiles) return current.files.size

    val nextVersion = current.version + 1
    val commitRel = s"data/c$nextVersion-compact-${UUID.randomUUID().toString.take(8)}"
    val commitDir = dir.resolve(commitRel)
    val df = spark.read
      .schema(current.schema)
      .parquet(current.files.map(f => dir.resolve(f).toString): _*)
    val clustered =
      if (clusterBy.nonEmpty)
        df.repartitionByRange(targetFiles, clusterBy.map(df.col): _*)
          .sortWithinPartitions(clusterBy.map(df.col): _*)
      else if (current.partitionColumns.nonEmpty)
        df.repartition(targetFiles, current.partitionColumns.map(df.col): _*)
          .sortWithinPartitions(current.partitionColumns.map(df.col): _*)
      else df.coalesce(targetFiles)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    clustered.write.parquet(commitDir.toString)

    val newFiles = Files.list(commitDir).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".parquet"))
      .map(n => s"$commitRel/$n").toSeq.sorted
    val conf = spark.sessionState.newHadoopConf()
    val newStats = newFiles.map { f =>
      f -> FooterStats.collect(conf,
        new org.apache.hadoop.fs.Path(dir.resolve(f).toString), current.schema)
    }.filter(_._2.nonEmpty).toMap
    TableMetadata.commit(dir, current.copy(
      version = nextVersion,
      files = newFiles,
      fileStats = newStats,
      snapshots = current.snapshots :+ Snapshot(
        nextVersion, System.currentTimeMillis(), "compact", newFiles.size, newFiles.size)))
    newFiles.size
  }

  /** Default vacuum file-age threshold: files modified more recently
    * than this are never deleted, whatever the snapshot log says. */
  val DefaultRetentionMs: Long = 10 * 60 * 1000L

  /** Delete data files not referenced by any of the latest
    * `retainVersions` metadata versions (older metadata stays readable
    * as history, but its exclusive files are gone). Returns deleted
    * file count.
    *
    * `retentionMs` guards in-flight commits: `commitInsert`/`compact`
    * write data files BEFORE publishing metadata, so a file absent from
    * every retained snapshot may belong to a commit that is about to
    * land — deleting it would corrupt that table version. Like
    * Delta/Iceberg vacuum, files younger than the retention window are
    * always kept; pass 0 only when no writer can be concurrent (tests,
    * single-writer maintenance jobs). */
  def vacuum(
      spark: SparkSession,
      catalog: String,
      namespace: Seq[String],
      table: String,
      retainVersions: Int = 1,
      retentionMs: Long = DefaultRetentionMs): Int = {
    require(retainVersions >= 1, "must retain at least the current version")
    val lt = lakehouseTable(spark, catalog, namespace, table)
    val dir = lt.tableDir
    val log = TableMetadata.loadLog(dir)
    val retained = log.takeRight(retainVersions).flatMap(_.files).toSet
    val dataDir = dir.resolve("data")
    if (!Files.isDirectory(dataDir)) return 0
    val cutoff = System.currentTimeMillis() - retentionMs
    val all = Files.walk(dataDir).iterator().asScala
      .filter(p => Files.isRegularFile(p))
      .map(p => dir.relativize(p).toString)
      .toList
    val doomed = all.filterNot { f =>
      retained.contains(f) || !f.endsWith(".parquet") ||
        scala.util.Try(Files.getLastModifiedTime(dir.resolve(f)).toMillis > cutoff)
          .getOrElse(true) // can't stat → assume young, keep
    }
    doomed.foreach(f => Files.deleteIfExists(dir.resolve(f)))
    // drop now-empty commit directories
    Files.list(dataDir).iterator().asScala.toList.foreach { d =>
      if (Files.isDirectory(d) && !Files.list(d).iterator().hasNext) Files.delete(d)
    }
    doomed.size
  }
}
