package graft.catalog

import java.nio.file.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, BindReferences, EqualNullSafe, Expression, Literal, Predicate}
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, Project}
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, StructType}

/** Write-time CHECK constraints (Delta's `ALTER TABLE ADD CONSTRAINT` /
  * the SQL-standard table CHECK), declared as table properties:
  * `'graft.check.<name>' = '<boolean SQL expression>'`.
  *
  * Semantics: a row VIOLATES a constraint iff the expression evaluates
  * to FALSE; NULL passes (the SQL-standard UNKNOWN rule — `k > 0`
  * admits a null `k`; combine with `k IS NOT NULL` to forbid it).
  *
  * Enforcement is row-local on every path that writes NEW user rows:
  *  - batch INSERT / INSERT OVERWRITE / CTAS / COW DML rewrites — a
  *    codegen'd guard expression riding the write projection
  *    ([[enforce]]), no extra pass, no shuffle, scale-free;
  *  - merge-on-read SQL MERGE/UPDATE inserts and updated row versions
  *    (the delta writer) and streaming epochs — a compiled catalyst
  *    predicate per task ([[RowChecks]]), same row-local cost.
  *
  * Declaring a constraint over EXISTING data verifies it first with one
  * distributed count over the merging read ([[verifyExisting]]), like
  * Delta; a violating table refuses the DDL with the violation count.
  * Expressions are validated at declaration (parse, resolve against
  * the table schema, boolean type, deterministic), so a typo fails the
  * DDL, never a later write.
  */
object CheckConstraints {
  val Prefix = "graft.check."

  def constraintsOf(props: Map[String, String]): Seq[(String, String)] =
    props.toSeq
      .collect { case (k, v) if k.startsWith(Prefix) => k.drop(Prefix.length) -> v }
      .sortBy(_._1)

  /** Parse + analyze `sql` against `schema`; the returned expression is
    * resolved and BOUND to the schema's field positions (row layout of
    * every writer). IllegalArgumentException on parse errors, unknown
    * columns, non-boolean type or nondeterminism. */
  def resolveBound(
      spark: SparkSession, schema: StructType, name: String, sql: String): Expression = {
    val e = resolveAny(spark, schema, name, sql)
    if (e.dataType != BooleanType)
      throw new IllegalArgumentException(
        s"CHECK constraint '$name' ('$sql') must be BOOLEAN, got ${e.dataType.simpleString}")
    if (!e.deterministic)
      throw new IllegalArgumentException(
        s"CHECK constraint '$name' ('$sql') must be deterministic")
    e
  }

  /** [[resolveBound]] without the boolean/determinism requirements —
    * shared by generated-column expressions ([[GeneratedColumns]]). */
  private[catalog] def resolveAny(
      spark: SparkSession, schema: StructType, name: String, sql: String): Expression = {
    val parsed =
      try spark.sessionState.sqlParser.parseExpression(sql)
      catch {
        case e: Exception => throw new IllegalArgumentException(
          s"'$name': cannot parse '$sql': ${e.getMessage}")
      }
    val rel = LocalRelation(DataTypeUtils.toAttributes(schema))
    val analyzed =
      try {
        val plan = spark.sessionState.analyzer.execute(
          Project(Seq(Alias(parsed, "c")()), rel))
        spark.sessionState.analyzer.checkAnalysis(plan)
        plan
      } catch {
        case e: IllegalArgumentException => throw e
        case e: Exception => throw new IllegalArgumentException(
          s"'$name' ('$sql') does not resolve against the " +
            s"table schema: ${e.getMessage}")
      }
    val e = analyzed.asInstanceOf[Project].projectList.head.asInstanceOf[Alias].child
    BindReferences.bindReference(e, rel.output)
  }

  /** Validate every declared constraint against `schema` (CREATE TABLE
    * and property-change guards). */
  def validate(spark: SparkSession, schema: StructType, props: Map[String, String]): Unit =
    constraintsOf(props).foreach { case (n, sql) => resolveBound(spark, schema, n, sql) }

  /** Batch-path enforcement: the returned frame is `df` with a
    * row-local codegen'd guard — any violating row fails the write
    * with the constraint name, expression and the offending row. */
  def enforce(df: DataFrame, props: Map[String, String]): DataFrame = {
    val cs = constraintsOf(props)
    if (cs.isEmpty) df
    else {
      val guard = cs.map { case (n, sql) =>
        when(expr(sql) <=> lit(false),
          raise_error(concat(
            lit(s"CHECK constraint '$n' ($sql) violated by row "),
            to_json(struct(df.columns.map(col): _*)))).cast(BooleanType))
          .otherwise(lit(true))
      }.reduce(_ && _)
      df.filter(guard)
    }
  }

  /** Row-path enforcement for InternalRow writers (delta DML tasks,
    * streaming epochs): expressions are bound on the driver, predicates
    * compile lazily per executor. */
  final case class RowChecks(checks: Seq[(String, String, Expression)]) extends Serializable {
    @transient private lazy val preds =
      checks.map { case (n, sql, e) =>
        (n, sql, Predicate.create(EqualNullSafe(e, Literal.FalseLiteral)))
      }
    def validate(row: InternalRow): Unit =
      preds.foreach { case (n, sql, p) =>
        if (p.eval(row))
          throw new IllegalStateException(
            s"CHECK constraint '$n' ($sql) violated by a written row")
      }
  }

  /** The compiled row checks for `schema`+`props`, or None when the
    * table declares no constraints (zero overhead on the hot path). */
  def rowChecks(
      spark: SparkSession, schema: StructType, props: Map[String, String]): Option[RowChecks] = {
    // declared CHECKs plus generated-column conformance (a row-level
    // writer cannot recompute a projection, so it validates instead)
    // plus identity NOT NULL (a row-level writer cannot mint — a MERGE
    // INSERT arriving without an identity value fails loudly instead
    // of committing NULL; updates carry the stored value and pass)
    val cs = constraintsOf(props) ++
      GeneratedColumns.conformanceChecks(spark, schema, props) ++
      IdentityColumns.conformanceChecks(schema, props)
    if (cs.isEmpty) None
    else Some(RowChecks(cs.map { case (n, sql) =>
      (n, sql, resolveBound(spark, schema, n, sql))
    }))
  }

  /** One distributed violation count over the merging read — the gate
    * for declaring a constraint on a table that already has data. */
  def verifyExisting(
      spark: SparkSession,
      tableDir: Path,
      meta: TableMetadata,
      name: String,
      sql: String): Unit = {
    if (meta.files.isEmpty) return
    val df = MergeOnRead.read(spark, tableDir, meta, meta.files)
    val violations = df.filter(expr(sql) <=> lit(false)).count()
    if (violations > 0)
      throw new IllegalStateException(
        s"cannot add CHECK constraint '$name' ($sql): $violations existing " +
          "rows violate it")
  }
}
