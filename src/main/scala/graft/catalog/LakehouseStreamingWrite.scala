package graft.catalog

import java.nio.file.{Files, Path}
import java.util.UUID
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DSv2 streaming sink: `df.writeStream.toTable("lakehouse.ns.t")`.
  *
  * Per micro-batch, the rows land as parquet in a fresh staging
  * directory through Spark's own DSv2 parquet writers (same delegation
  * as the batch read/write paths), then `commit(epochId, …)` publishes
  * them with ONE atomic metadata swap that also records the
  * `(queryId, epochId)` watermark — the same exactly-once mechanism as
  * [[Maintenance.transactionalAppend]]: a batch replayed after a
  * commit-then-checkpoint-crash sees its watermark and discards the
  * staged files instead of double-appending. `complete`-mode queries
  * (the builder's truncate() path) publish each epoch as a whole-table
  * replace, so a streaming aggregation materializes into a
  * time-travelable lakehouse table.
  *
  * Streamed files land as the tasks produced them (no per-commit
  * re-clustering — there is no DataFrame to repartition at this layer);
  * partition-scoped compaction (`CALL system.compact_where`) is the
  * standing repair for streaming-sized files, exactly as for the
  * foreachBatch ingest path.
  */
class LakehouseStreamingWrite(
    spark: SparkSession,
    identName: String,
    tableDir: Path,
    info: LogicalWriteInfo,
    replace: Boolean)
  extends StreamingWrite {

  /** The epoch currently being written: staging dir + the delegate
    * parquet BatchWrite that finalizes task files into it. Micro-batch
    * execution is strictly sequential per query (factory → tasks →
    * commit), so a single slot suffices. */
  @volatile private var pending: Option[(String, BatchWrite)] = None

  // The delegate parquet writers commit through the Hadoop commit
  // protocol, which asks the OutputCommitCoordinator itself; asking a
  // second time at the DSv2 layer gets the inner ask DENIED (first
  // authorization wins). Same setting as Spark's own FileBatchWrite.
  override def useCommitCoordinator(): Boolean = false

  override def createStreamingWriterFactory(
      pInfo: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val meta = TableMetadata.load(tableDir)
    val stagingRel = s"data/s-${UUID.randomUUID().toString.take(12)}"
    val stagingDir = tableDir.resolve(stagingRel)
    // micros timestamps → skippable stats; toBatch + factory creation
    // capture the scoped conf into the write job, nothing leaks
    val (innerWrite, delegate) = SessionConf.withMicros(spark) {
      val w = ParquetTable(identName, spark,
        new CaseInsensitiveStringMap(Map("path" -> stagingDir.toString).asJava),
        Seq(stagingDir.toString), Some(meta.schema), classOf[ParquetFileFormat])
        .newWriteBuilder(info)
        .build()
        .toBatch
      (w, w.createBatchWriterFactory(pInfo): DataWriterFactory)
    }
    pending = Some((stagingRel, innerWrite))
    // CHECK constraints guard every streamed row before it reaches the
    // epoch's staging files — same row-local predicate the delta DML
    // writers compile, zero overhead when the table declares none.
    // Generated columns are COMPUTED first (the stream source need not
    // supply them correctly — "always generated" holds by construction
    // on this path exactly as on batch writes).
    val checks = CheckConstraints.rowChecks(spark, meta.schema, meta.properties)
    val gen = GeneratedColumns.rowGenerate(spark, meta.schema, meta.properties)
    new StreamingDataWriterFactory {
      override def createWriter(partitionId: Int, taskId: Long, epochId: Long):
          org.apache.spark.sql.connector.write.DataWriter[
            org.apache.spark.sql.catalyst.InternalRow] = {
        val inner = delegate.createWriter(partitionId, taskId)
        (checks, gen) match {
          case (None, None) => inner
          case (c, g) =>
            new org.apache.spark.sql.connector.write.DataWriter[
                org.apache.spark.sql.catalyst.InternalRow] {
              override def write(r: org.apache.spark.sql.catalyst.InternalRow): Unit = {
                val out = g match { case Some(gg) => gg(r); case None => r }
                c.foreach(_.validate(out)); inner.write(out)
              }
              override def commit(): WriterCommitMessage = inner.commit()
              override def abort(): Unit = inner.abort()
              override def close(): Unit = inner.close()
            }
        }
      }
    }
  }

  /** CDC upsert mode: `.option("graft.upsertKeys", "k1,k2")` makes
    * each micro-batch a merge-on-read upsert — current rows matching
    * the batch's keys die, the batch's rows live, no data file
    * rewritten (the Flink-CDC-into-Iceberg shape). Mutually exclusive
    * with complete/truncate mode. */
  private val upsertKeys: Option[Seq[String]] =
    Option(info.options.get("graft.upsertKeys"))
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val (stagingRel, innerWrite) = pending.getOrElse(
      throw new IllegalStateException(s"commit of epoch $epochId with no pending write"))
    pending = None
    innerWrite.commit(messages) // finalize task files into the staging dir
    val stagingDir = tableDir.resolve(stagingRel)
    val newFiles =
      if (!Files.isDirectory(stagingDir)) Seq.empty
      else Fs.children(stagingDir).iterator
        .map(_.getFileName.toString).filter(_.endsWith(".parquet"))
        .map(n => s"$stagingRel/$n").toSeq.sorted
    val meta = TableMetadata.load(tableDir)
    // an empty epoch in append mode publishes nothing (no metadata
    // churn); in replace mode it must still truncate — publish anyway
    if (newFiles.isEmpty && !replace) return
    upsertKeys match {
      case Some(keys) =>
        require(!replace,
          "graft.upsertKeys and complete/truncate output mode are mutually exclusive")
        Maintenance.watermarkedUpsertPublish(spark, tableDir, newFiles, keys,
          meta.schema, meta.properties, s"stream-${info.queryId()}", epochId)
      case None =>
        Maintenance.watermarkedPublish(spark, tableDir, newFiles, meta.schema,
          meta.properties, s"stream-${info.queryId()}", epochId, replace)
    }
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    pending.foreach { case (stagingRel, innerWrite) =>
      pending = None
      try innerWrite.abort(messages)
      finally {
        val stagingDir = tableDir.resolve(stagingRel)
        if (Files.isDirectory(stagingDir)) {
          Fs.deleteRecursively(stagingDir)
        }
      }
    }
  }
}
