package graft.catalog

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, EqualNullSafe, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.LeftAnti
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, InsertIntoStatement, Join, JoinHint, LogicalPlan, MergeIntoTable, Project, Union, UpdateTable, V2WriteCommand}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Analyzer rule that makes merge-on-read deletes transparent to every
  * batch read (`SELECT`, `spark.table`, views, subqueries, time
  * travel): a relation over a table with applicable delete entries is
  * rewritten into
  *
  * {{{
  *   Project(original attrs,
  *     Union(
  *       scan(clean files),                      // join-free — the bulk
  *       scan(dirty files) ⟕anti delete-keys))   // null-safe key equality
  * }}}
  *
  * Files group by their APPLICABLE entry set (sequence order + footer
  * key-range overlap, [[MergeOnRead.applicable]]), so a delete touching
  * one day's keys leaves every other file on the join-free branch — at
  * 100 TB the anti-join build side is a broadcast of the key parquet
  * and the probe side only the overlapping files. Sub-scans carry
  * [[MergeOnRead.PlainReadOption]] so the rule (and the last-resort
  * scan guard) never re-applies entries; write-target relations
  * (INSERT/MERGE/UPDATE/DELETE targets) are left untouched — only
  * their read sides merge.
  *
  * Installed by [[graft.functions.GraftExtensions]] alongside the view
  * resolution rule.
  */
case class MorReads(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val targets = writeTargetRelations(plan)
    plan.transformUpWithSubqueries {
      case r: DataSourceV2Relation if !targets.contains(r) && isDirty(r) =>
        rewrite(r)
    }
  }

  private def isDirty(r: DataSourceV2Relation): Boolean = r.table match {
    case lt: LakehouseTable =>
      !r.options.containsKey(MergeOnRead.PlainReadOption) &&
        MergeOnRead.anyApplicable(lt.meta, lt.meta.files)
    case _ => false
  }

  /** Relations in WRITE position (identity set): the target of an
    * INSERT/MERGE/UPDATE/DELETE must stay a plain relation for Spark's
    * own command resolution; subquery/source reads of the same table
    * are separate instances and still merge. */
  private def writeTargetRelations(plan: LogicalPlan): java.util.Set[LogicalPlan] = {
    val s = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[LogicalPlan, java.lang.Boolean]())
    def relsUnder(p: LogicalPlan): Unit = p.foreach {
      case r: DataSourceV2Relation => s.add(r)
      case _ => ()
    }
    plan.foreach {
      case w: V2WriteCommand => relsUnder(w.table)
      case i: InsertIntoStatement => relsUnder(i.table)
      case d: DeleteFromTable => relsUnder(d.table)
      case u: UpdateTable => relsUnder(u.table)
      case m: MergeIntoTable => relsUnder(m.targetTable)
      case _ => ()
    }
    s
  }

  private def rewrite(r: DataSourceV2Relation): LogicalPlan = {
    val lt = r.table.asInstanceOf[LakehouseTable]
    val meta = lt.meta
    val resolver = spark.sessionState.conf.resolver

    val groups = meta.files.groupBy(f => MergeOnRead.applicable(meta, f)).toSeq
      .sortBy(_._2.head) // deterministic branch order
    val branches: Seq[LogicalPlan] = groups.map { case (entries, files) =>
      if (entries.exists(_.isPositional)) {
        // positional entries match on the scan's _metadata struct (file
        // path + row_index) — a file-source feature the DSv2 wrapper
        // does not expose, so this branch is built with the Dataset
        // API over a plain parquet scan of the SAME file subset
        // (MergeOnRead.read applies equality and positional entries in
        // sequence order); pushdown/pruning still reach the file scan
        MergeOnRead.read(spark, lt.tableDir, meta, files)
          .select(meta.schema.fieldNames.map(org.apache.spark.sql.functions.col)
            .toIndexedSeq: _*)
          .queryExecution.analyzed
      } else {
        val sub = subRelation(r, lt, files)
        // same-commit same-key-shape entries are ONE logical delete
        // that fanned out to several files on write: scan them together
        // and anti-join once (anti joins commute, so grouping only
        // changes the plan; the sort keeps it deterministic)
        val grouped = entries.groupBy(d => (d.seq, d.keyColumns)).toSeq
          .sortBy { case ((seq, cols), _) => (seq, cols.mkString(",")) }
        grouped.foldLeft(sub: LogicalPlan) { case (p, ((_, keyCols), es)) =>
          val keysPlan = spark.read
            .schema(MergeOnRead.keySchema(meta.schema, keyCols))
            .parquet(es.map(e => lt.tableDir.resolve(e.path).toString): _*)
            .queryExecution.analyzed
          val cond = keyCols.map { k =>
            val l = p.output.find(a => resolver(a.name, k)).getOrElse(
              throw new IllegalStateException(s"merge-on-read key column $k missing from scan"))
            val rk = keysPlan.output.find(a => resolver(a.name, k)).get
            EqualNullSafe(l, rk): Expression
          }.reduce(And(_, _))
          Join(p, keysPlan, LeftAnti, Some(cond), JoinHint.NONE)
        }
      }
    }
    val merged = if (branches.size == 1) branches.head else Union(branches)
    // hand the parent back its original attribute ids
    val restored: Seq[NamedExpression] = r.output.zip(merged.output).map {
      case (o: AttributeReference, n) =>
        Alias(n, o.name)(exprId = o.exprId, qualifier = o.qualifier,
          explicitMetadata = Some(o.metadata))
    }
    Project(restored, merged)
  }

  /** A fresh relation over a FILE SUBSET of the same table snapshot,
    * marked plain-read. Fresh attribute ids per branch (required for
    * self-union); file-level stats, bloom sidecars, and runtime
    * filtering all keep working through the copied metadata.
    *
    * ANONYMOUS on purpose (no catalog/identifier): temp-view storage
    * (ViewHelper.prepareTemporaryViewPlan) normalizes any NAMED
    * DSv2 relation into a V2TableReference — name + options only —
    * which re-resolution later reloads as the FULL CURRENT table. A
    * named sub-relation round-tripped through a Dataset temp view
    * (`df.createOrReplaceTempView` + `INSERT INTO … SELECT`) would
    * therefore silently drop its file subset while keeping the
    * plain-read marker: every branch rescans all files raw, deleted
    * rows resurrect and rows duplicate per branch. Anonymous relations
    * fail the reference rewrite's `catalog.isDefined && identifier
    * .isDefined` guard and are stored verbatim. */
  private def subRelation(
      r: DataSourceV2Relation, lt: LakehouseTable, files: Seq[String]): DataSourceV2Relation = {
    val keep = files.toSet
    val subMeta = lt.meta.copy(
      files = files,
      fileStats = lt.meta.fileStats.view.filterKeys(keep.contains).toMap,
      fileRows = lt.meta.fileRows.view.filterKeys(keep.contains).toMap,
      fileSeq = lt.meta.fileSeq.view.filterKeys(keep.contains).toMap,
      deleteFiles = Seq.empty)
    val subTable = new LakehouseTable(spark, lt.name(), lt.tableDir, subMeta)
    val opts = new java.util.HashMap[String, String](r.options)
    opts.put(MergeOnRead.PlainReadOption, "true")
    DataSourceV2Relation.create(
      subTable, None, None, new CaseInsensitiveStringMap(opts))
  }
}
