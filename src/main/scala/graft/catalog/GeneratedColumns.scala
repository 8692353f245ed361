package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Generated columns (`c TYPE GENERATED ALWAYS AS (expr)` — the
  * Delta/ANSI surface): the expression is stored as a table property
  * `graft.generated.<col>` at CREATE and the ENGINE computes the value
  * on every write — whatever the incoming frame carries for the column
  * is overwritten, so "always generated" holds by construction rather
  * than by trusting writers.
  *
  * Paths: batch writes (INSERT/CTAS/OVERWRITE/COW DML — everything
  * through the V1 InsertableRelation) COMPUTE the column row-locally
  * inside the write projection ([[compute]], codegen'd, no extra
  * pass). Row-level writers that receive already-materialized rows
  * (merge-on-read MERGE/UPDATE inserts, streaming epochs) cannot
  * recompute a projection cheaply, so they VALIDATE conformance
  * instead: a row whose stored value differs from the generation
  * expression fails the write ([[conformanceChecks]] — the same
  * compiled-predicate machinery CHECK constraints use). Either way a
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
    * (violation iff NOT (stored <=> expr)). */
  def conformanceChecks(
      spark: SparkSession,
      schema: StructType,
      props: Map[String, String]): Seq[(String, String)] =
    of(props).map { case (c, sql) =>
      val field = schema.fields.find(_.name.equalsIgnoreCase(c)).get
      (s"generated:$c",
        s"`${field.name}` <=> CAST(($sql) AS ${field.dataType.sql})")
    }
}
