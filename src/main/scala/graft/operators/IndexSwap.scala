package graft.operators

import org.apache.spark.sql.SparkSession

/** Crash recovery for the rebuild-and-swap window shared by
  * [[TextIndex]] and [[VectorIndex]]: a full rebuild stages the
  * replacement under `<name>__rebuild`, then DROPs the live index and
  * RENAMEs the staging over it. A crash between those two metadata ops
  * leaves no table under the index name — but the fully-built
  * replacement is on disk, and its maintenance contract property
  * (written only after the build completes) proves it whole. Loading
  * an index therefore falls back to ADOPTING the staged rebuild:
  * rename it into place and retry, instead of failing until a manual
  * rename. */
object IndexSwap {

  /** The shared catalog-resolution chain — one home ([[TextIndex]] and
    * [[VectorIndex]] delegate here) so table-resolution changes land
    * once. */
  private[operators] def lakeTable(
      spark: SparkSession, catalog: String, namespace: Seq[String],
      name: String): graft.catalog.LakehouseTable =
    spark.sessionState.catalogManager.catalog(catalog)
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(namespace.toArray, name))
      .asInstanceOf[graft.catalog.LakehouseTable]

  /** Load `name`, adopting a completed `<name>__rebuild` staging if the
    * live table vanished mid-swap. `completenessProp` is the operator's
    * contract property whose presence proves the staged build finished
    * (both operators set it only after the data is written). */
  def loadOrAdopt(
      spark: SparkSession,
      catalog: String,
      namespace: Seq[String],
      name: String,
      completenessProp: String): graft.catalog.LakehouseTable =
    try lakeTable(spark, catalog, namespace, name)
    catch {
      case e: Throwable if isMissingTable(e) =>
        val tmpName = name + "__rebuild"
        val complete =
          try {
            val tmp = lakeTable(spark, catalog, namespace, tmpName)
            graft.catalog.TableMetadata.load(tmp.tableDir)
              .properties.contains(completenessProp)
          } catch { case t: Throwable if isMissingTable(t) => false }
        if (!complete) throw e
        // concurrent adopters race on the RENAME: the loser's failure
        // is benign (the winner installed the same staging) — swallow
        // it and load whatever is live now
        try spark.sql(s"ALTER TABLE ${(catalog +: namespace :+ tmpName).mkString(".")} " +
          s"RENAME TO ${(namespace :+ name).mkString(".")}")
        catch { case _: Throwable => () }
        lakeTable(spark, catalog, namespace, name)
    }

  /** Properties whose presence proves a staged rebuild FINISHED — each
    * operator writes its contract property only after the staging's
    * data is completely written. */
  val CompletenessProps: Seq[String] =
    Seq(TextIndex.VersionProp, VectorIndex.VersionProp)

  /** Reap a crash-orphaned PARTIAL `<table>__rebuild` staging (called
    * by Maintenance.vacuum/autoCompact): a rebuild that died mid-build
    * leaves a staging table with no completeness property — invisible
    * to adoption (which rightly refuses incomplete stagings) and to
    * per-table vacuum (it is its own table), so nothing ever removed
    * it. Guards:
    *  - a COMPLETED staging is never reaped — the adoption path owns
    *    it (and a full rebuild re-stages with DROP IF EXISTS anyway);
    *  - a staging ANY of whose files (metadata, data, committer temp
    *    files) changed within `retentionMs` is never reaped — that is
    *    an IN-FLIGHT rebuild writing right now. The liveness signal is
    *    the NEWEST mtime under the whole table dir, not the metadata
    *    version file: a full rebuild writes staging data in one long
    *    INSERT that commits only at the end, so the metadata mtime
    *    stays at CREATE time throughout while the in-progress write's
    *    task files under `data/` (and `_temporary/`) keep advancing.
    * Returns true when the orphan was dropped. */
  def reapStaleStaging(
      spark: SparkSession,
      catalog: String,
      namespace: Seq[String],
      table: String,
      retentionMs: Long): Boolean = {
    val tmpName = table + "__rebuild"
    val staged =
      try Some(lakeTable(spark, catalog, namespace, tmpName))
      catch { case e: Throwable if isMissingTable(e) => None }
    staged match {
      case None => false
      case Some(tmp) =>
        val props = graft.catalog.TableMetadata.load(tmp.tableDir).properties
        if (CompletenessProps.exists(props.contains)) return false
        // newest mtime anywhere under the staging dir — bounded walk
        // (one staging table's files) on a maintenance tick
        val newest =
          try {
            val s = java.nio.file.Files.walk(tmp.tableDir)
            try {
              import scala.jdk.CollectionConverters._
              s.iterator().asScala
                .filter(java.nio.file.Files.isRegularFile(_))
                .map(p => java.nio.file.Files.getLastModifiedTime(p).toMillis)
                .foldLeft(0L)(math.max)
            } finally s.close()
          }
          catch { case _: Throwable => return false } // can't stat → assume live
        if (newest == 0L || System.currentTimeMillis() - newest < retentionMs)
          return false
        spark.sql(s"DROP TABLE IF EXISTS ${(catalog +: namespace :+ tmpName).mkString(".")}")
        true
    }
  }

  private def isMissingTable(e: Throwable): Boolean = e match {
    case _: org.apache.spark.sql.catalyst.analysis.NoSuchTableException => true
    case a: org.apache.spark.sql.AnalysisException =>
      a.getMessage != null && (a.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND") ||
        a.getMessage.toLowerCase.contains("not found"))
    case _ => false
  }
}
