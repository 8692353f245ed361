package graft.catalog

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, View, ViewCatalog, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.StructType

/** SQL wiring for persistent views on [[LakehouseCatalog]].
  *
  * Spark 4.1 ships the DSv2 `ViewCatalog` SPI but NO analyzer or
  * parser support for it — `CREATE VIEW cat.ns.v` against any
  * non-session catalog dies in `ResolveSessionCatalog` with
  * MISSING_CATALOG_ABILITY (and that rule runs before any injected
  * resolution rule can help, so the DDL must be intercepted at PARSE
  * time). This object supplies the missing wiring as standard session
  * extensions:
  *
  *  - [[ViewAwareParser]] rewrites parsed `CreateView` / `DropView` /
  *    `ShowViews` plans whose identifier lands in a lakehouse catalog
  *    into already-resolved runnable commands (everything else passes
  *    through untouched);
  *  - [[ResolveLakehouseViews]] resolves reads: an
  *    `UnresolvedRelation` naming a stored view expands to its parsed
  *    body with relative table references re-qualified under the
  *    view's CAPTURED definition context (catalog + namespace, as
  *    `ViewInfo` records them) — so the view means the same thing from
  *    any session, like the v1 view path's AnalysisContext. Nested
  *    views resolve on later fixed-point iterations; cycles exhaust
  *    the analyzer's iteration budget and fail loudly.
  */
object LakehouseViews {

  private def isLakehouseCatalog(spark: SparkSession, name: String): Boolean =
    spark.conf.getOption(s"spark.sql.catalog.$name")
      .contains(classOf[LakehouseCatalog].getName)

  /** Head of a multi-part name that must NOT be treated as relative to
    * the current (lakehouse) catalog: another registered catalog, or
    * the global-temp database. Routing those into the lakehouse would
    * hijack `spark_catalog.db.v` / `global_temp.gv` DDL. */
  private def claimsOtherResolution(spark: SparkSession, head: String): Boolean = {
    val cm = spark.sessionState.catalogManager
    (!isLakehouseCatalog(spark, head) && scala.util.Try(cm.catalog(head)).isSuccess) ||
      head == spark.sessionState.conf.getConf(
        org.apache.spark.sql.internal.StaticSQLConf.GLOBAL_TEMP_DATABASE)
  }

  /** (catalog, namespace, name) when `parts` names a view in a
    * lakehouse catalog — fully qualified, relative to the session's
    * current catalog, or relative to the current catalog AND current
    * namespace (the common `USE lakehouse.ns; SELECT * FROM v` path). */
  private def viewParts(
      spark: SparkSession, parts: Seq[String]): Option[(ViewCatalog, Identifier)] = {
    val cm = spark.sessionState.catalogManager
    val cur = cm.currentCatalog.name()
    val relativeOk = isLakehouseCatalog(spark, cur) &&
      !claimsOtherResolution(spark, parts.head)
    val candidates = Seq(
      Option.when(parts.size >= 2 && isLakehouseCatalog(spark, parts.head))(
        (parts.head, parts.tail)),
      Option.when(relativeOk && parts.size == 1)(
        (cur, cm.currentNamespace.toSeq ++ parts)),
      Option.when(relativeOk)((cur, parts))).flatten
    candidates.collectFirst {
      case (cat, rest) if rest.nonEmpty &&
        cm.catalog(cat).isInstanceOf[ViewCatalog] &&
        cm.catalog(cat).asInstanceOf[ViewCatalog]
          .viewExists(Identifier.of(rest.init.toArray, rest.last)) =>
        (cm.catalog(cat).asInstanceOf[ViewCatalog],
          Identifier.of(rest.init.toArray, rest.last))
    }
  }

  /** DDL interception at parse time (see class doc for why). */
  final class ViewAwareParser(spark: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

    override def parsePlan(sqlText: String): LogicalPlan =
      rewrite(delegate.parsePlan(sqlText))

    /** Fully-qualified (catalog +: ns :+ name) when the identifier —
      * absolute OR relative to the session's current catalog/namespace
      * at parse time — lands in a lakehouse catalog. */
    private def qualifyIdent(parts: Seq[String]): Option[Seq[String]] =
      if (parts.size >= 2 && isLakehouseCatalog(spark, parts.head)) Some(parts)
      // `spark_catalog.db.v` / `global_temp.gv` name another resolution
      // domain even when the CURRENT catalog is a lakehouse — pass them
      // through to the delegate untouched
      else if (parts.size >= 2 && claimsOtherResolution(spark, parts.head)) None
      else {
        val cm = spark.sessionState.catalogManager
        val cur = cm.currentCatalog.name()
        Option.when(isLakehouseCatalog(spark, cur))(
          if (parts.size == 1) cur +: (cm.currentNamespace.toSeq ++ parts)
          else cur +: parts)
      }

    private def qualifyNamespace(parts: Seq[String]): Option[Seq[String]] =
      if (parts.nonEmpty && isLakehouseCatalog(spark, parts.head)) Some(parts)
      else if (parts.nonEmpty && claimsOtherResolution(spark, parts.head)) None
      else {
        val cm = spark.sessionState.catalogManager
        val cur = cm.currentCatalog.name()
        Option.when(isLakehouseCatalog(spark, cur))(
          if (parts.isEmpty) cur +: cm.currentNamespace.toSeq else cur +: parts)
      }

    private def rewrite(plan: LogicalPlan): LogicalPlan = plan match {
      case cv @ CreateView(UnresolvedIdentifier(parts, _), userCols, comment, _,
          props, originalText, _, allowExisting, replace, _) =>
        qualifyIdent(parts) match {
          case Some(full) =>
            CreateLakehouseViewCommand(full, originalText.getOrElse(
                throw new IllegalArgumentException("CREATE VIEW without query text")),
              userCols.map(_._1), comment, props, allowExisting, replace)
          case None => cv
        }
      case dv @ DropView(UnresolvedIdentifier(parts, _), ifExists) =>
        qualifyIdent(parts) match {
          case Some(full)
              // a RELATIVE name under a lakehouse current catalog may
              // still mean a temp view — only steal it when the stored
              // view actually exists; fully-qualified names always route
              if parts.size >= 2 || viewParts(spark, full).isDefined =>
            DropLakehouseViewCommand(full, ifExists)
          case _ => dv
        }
      case sv @ ShowViews(UnresolvedNamespace(parts, _), pattern, output) =>
        qualifyNamespace(parts) match {
          case Some(full) => ShowLakehouseViewsCommand(full, pattern, output)
          case None => sv
        }
      case other => other
    }

    override def parseExpression(sqlText: String): Expression =
      delegate.parseExpression(sqlText)
    override def parseTableIdentifier(sqlText: String): TableIdentifier =
      delegate.parseTableIdentifier(sqlText)
    override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
      delegate.parseFunctionIdentifier(sqlText)
    override def parseMultipartIdentifier(sqlText: String): Seq[String] =
      delegate.parseMultipartIdentifier(sqlText)
    override def parseQuery(sqlText: String): LogicalPlan =
      delegate.parseQuery(sqlText)
    override def parseTableSchema(sqlText: String): StructType =
      delegate.parseTableSchema(sqlText)
    override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
      delegate.parseDataType(sqlText)
    override def parseRoutineParam(sqlText: String): StructType =
      delegate.parseRoutineParam(sqlText)
  }

  /** Read path: expand stored views into their (re-qualified) bodies. */
  final case class ResolveLakehouseViews(spark: SparkSession) extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
      case u: UnresolvedRelation =>
        viewParts(spark, u.multipartIdentifier) match {
          case None => u
          case Some((cat, ident)) =>
            val v = cat.loadView(ident)
            val body = spark.sessionState.sqlParser.parsePlan(v.query)
            val qualified = requalify(body, v)
            val aliased =
              if (v.columnAliases.isEmpty) qualified
              else Project(
                v.queryColumnNames.zip(v.columnAliases).toSeq.map { case (q, a) =>
                  Alias(UnresolvedAttribute.quoted(q), a)()
                }, qualified)
            SubqueryAlias(ident.name, aliased)
        }
    }

    /** Re-qualify the body's relative table references under the
      * view's captured definition context, so the view reads the same
      * tables regardless of the reader's current catalog/namespace. */
    private def requalify(body: LogicalPlan, v: View): LogicalPlan = {
      val cm = spark.sessionState.catalogManager
      def isCatalogName(n: String): Boolean =
        scala.util.Try(cm.catalog(n)).isSuccess
      // transformDownWithSubqueries, not transform: relations inside
      // scalar / IN / EXISTS / lateral subquery EXPRESSIONS must be
      // re-qualified too, or they'd resolve against the READER's
      // context — silently reading a different table
      body transformDownWithSubqueries {
        case r: UnresolvedRelation if r.multipartIdentifier.size < 3 &&
            !isCatalogName(r.multipartIdentifier.head) =>
          val parts = r.multipartIdentifier
          val full =
            if (parts.size == 1) v.currentCatalog +: (v.currentNamespace.toSeq :+ parts.head)
            else v.currentCatalog +: parts
          new UnresolvedRelation(full, r.options, r.isStreaming)
      }
    }
  }

  final case class CreateLakehouseViewCommand(
      parts: Seq[String],
      viewSql: String,
      columnAliases: Seq[String],
      comment: Option[String],
      properties: Map[String, String],
      allowExisting: Boolean,
      replace: Boolean) extends LeafRunnableCommand {

    override def run(spark: SparkSession): Seq[Row] = {
      val cm = spark.sessionState.catalogManager
      val cat = cm.catalog(parts.head).asInstanceOf[ViewCatalog]
      val ident = Identifier.of(parts.tail.init.toArray, parts.last)
      // analyze the body NOW (in the creator's resolution context) so
      // bad references fail at definition time and the schema is known
      val analyzed = spark.sql(viewSql)
      val schema = analyzed.schema
      require(columnAliases.isEmpty || columnAliases.size == schema.size,
        s"view column list has ${columnAliases.size} names, query produces ${schema.size}")
      val props = properties ++ comment.map(ViewCatalog.PROP_COMMENT -> _)
      val info = new ViewInfo(ident, viewSql,
        cm.currentCatalog.name(), cm.currentNamespace,
        schema, schema.fieldNames,
        columnAliases.toArray, Array.fill[String](columnAliases.size)(null),
        props.asJava)
      if (replace) cat.replaceView(info, true)
      else if (cat.viewExists(ident)) {
        if (!allowExisting)
          throw new org.apache.spark.sql.catalyst.analysis.ViewAlreadyExistsException(ident)
      } else cat.createView(info)
      Seq.empty
    }
  }

  final case class DropLakehouseViewCommand(parts: Seq[String], ifExists: Boolean)
    extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[Row] = {
      val cat = spark.sessionState.catalogManager.catalog(parts.head)
        .asInstanceOf[ViewCatalog]
      val ident = Identifier.of(parts.tail.init.toArray, parts.last)
      if (!cat.dropView(ident) && !ifExists)
        throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident)
      Seq.empty
    }
  }

  final case class ShowLakehouseViewsCommand(
      parts: Seq[String],
      pattern: Option[String],
      override val output: Seq[Attribute]) extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[Row] = {
      val cat = spark.sessionState.catalogManager.catalog(parts.head)
        .asInstanceOf[ViewCatalog]
      val ns = parts.tail
      cat.listViews(ns: _*).toSeq
        .filter(id => pattern.forall(p =>
          org.apache.spark.sql.catalyst.util.StringUtils.filterPattern(
            Seq(id.name), p).nonEmpty))
        .sortBy(_.name)
        .map(id => Row(ns.mkString("."), id.name, false))
    }
  }
}
