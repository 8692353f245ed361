package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Cast, Expression, UnsafeProjection}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Generated columns (`c TYPE GENERATED ALWAYS AS (expr)` — the
  * Delta/ANSI surface): the expression is stored as a table property
  * `graft.generated.<col>` at CREATE and the ENGINE computes the value
  * on every write — whatever the incoming frame carries for the column
  * is overwritten, so "always generated" holds by construction rather
  * than by trusting writers.
  *
  * Paths: batch writes (INSERT/CTAS/OVERWRITE — everything through
  * the V1 InsertableRelation) COMPUTE the column row-locally inside
  * the write projection ([[compute]], codegen'd, no extra pass).
  * Row-level writers that receive already-materialized InternalRows
  * (merge-on-read MERGE/UPDATE, COW rewrites, streaming epochs)
  * COMPUTE too, through a driver-bound projection compiled per task
  * ([[rowGenerate]] — the same machinery CHECK row-predicates use), so
  * a MERGE that omits or mis-states the generated column still commits
  * the computed value — Delta computes on every write path, and
  * validate-instead-of-compute made generated columns unusable with
  * MoR MERGE. [[conformanceChecks]] remains for AFTER-the-fact
  * verification of rows written outside the engine's projections
  * (add_files imports, the INSERT race re-verify). Either way a
  * committed file can never hold a value that disagrees with the
  * expression.
  *
  * Declaration-time validation: the expression must parse, resolve
  * against the table's NON-generated columns only (no chains, no
  * self-reference), and be deterministic — reusing the CHECK
  * constraint resolver, minus the boolean requirement.
  */
object GeneratedColumns {
  val Prefix = "graft.generated."

  def of(props: Map[String, String]): Seq[(String, String)] =
    props.toSeq
      .collect { case (k, v) if k.startsWith(Prefix) => k.drop(Prefix.length) -> v }
      .sortBy(_._1)

  /** Declaration-time validation (CREATE TABLE): resolve each
    * generation expression against the non-generated columns. */
  def validate(spark: SparkSession, schema: StructType, props: Map[String, String]): Unit = {
    val gen = of(props)
    if (gen.isEmpty) return
    val genNames = gen.map(_._1.toLowerCase).toSet
    val base = StructType(schema.fields.filterNot(f => genNames.contains(f.name.toLowerCase)))
    gen.foreach { case (c, sql) =>
      require(schema.fieldNames.exists(_.equalsIgnoreCase(c)),
        s"generated column '$c' does not exist in the schema")
      val e =
        try CheckConstraints.resolveAny(spark, base, s"generated:$c", sql)
        catch {
          case ex: IllegalArgumentException => throw new IllegalArgumentException(
            s"generation expression for '$c' ($sql): ${ex.getMessage} — " +
              "generation expressions may reference only non-generated columns")
        }
      require(e.deterministic, s"generation expression for '$c' ($sql) must be deterministic")
    }
  }

  /** Batch-path computation: overwrite every generated column with its
    * expression, cast to the declared type — row-local, codegen'd. */
  def compute(df: DataFrame, schema: StructType, props: Map[String, String]): DataFrame =
    of(props).foldLeft(df) { case (d, (c, sql)) =>
      val field = schema.fields.find(_.name.equalsIgnoreCase(c)).getOrElse(
        throw new IllegalStateException(s"generated column '$c' missing from table schema"))
      d.withColumn(field.name, expr(sql).cast(field.dataType))
    }

  /** Row-path conformance: for writers that receive materialized rows,
    * a stored value that differs from the generation expression is a
    * constraint violation. Expressed as CHECK-style predicates
    * (violation iff NOT (stored <=> expr)). A declared generated
    * column absent from `schema` yields no check — nothing is stored
    * under that schema to conform (a racer's ADD COLUMN can make the
    * property set run ahead of the schema a writer verified against). */
  def conformanceChecks(
      spark: SparkSession,
      schema: StructType,
      props: Map[String, String]): Seq[(String, String)] =
    of(props).flatMap { case (c, sql) =>
      schema.fields.find(_.name.equalsIgnoreCase(c)).map { field =>
        (s"generated:$c",
          s"`${field.name}` <=> CAST(($sql) AS ${field.dataType.sql})")
      }
    }

  /** Row-path COMPUTATION for InternalRow writers (delta DML tasks,
    * streaming epochs, COW rewrite rows): a bound projection over the
    * full table row that OVERWRITES every generated column with its
    * expression — the same "always generated" by construction the
    * batch projection gives, so a MERGE ... INSERT that supplies a
    * placeholder (or stale) value for the generated column still
    * commits the computed one (Delta computes on every write path;
    * validating instead made generated columns unusable with MoR
    * MERGE). Expressions are bound on the driver; the projection
    * compiles lazily per executor. */
  final case class RowGenerate(exprs: Seq[Expression]) extends Serializable {
    @transient private lazy val proj = UnsafeProjection.create(exprs)
    def apply(row: InternalRow): InternalRow = proj(row)
  }

  /** The compiled row generator for `schema`+`props`, or None when the
    * table declares no generated columns (zero overhead otherwise). */
  def rowGenerate(
      spark: SparkSession,
      schema: StructType,
      props: Map[String, String]): Option[RowGenerate] = {
    val gen = of(props)
    if (gen.isEmpty) None
    else {
      val tz = Option(spark.sessionState.conf.sessionLocalTimeZone)
      val exprs: Seq[Expression] = schema.fields.zipWithIndex.map { case (f, i) =>
        gen.find(_._1.equalsIgnoreCase(f.name)) match {
          case Some((c, sql)) =>
            // binds against the FULL row layout; the expression itself
            // references only non-generated columns (validated at
            // declaration), so positions resolve cleanly
            Cast(CheckConstraints.resolveAny(spark, schema, s"generated:$c", sql),
              f.dataType, tz)
          case None => BoundReference(i, f.dataType, f.nullable)
        }
      }.toSeq
      Some(RowGenerate(exprs))
    }
  }
}
