package graft.catalog

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DateType, IntegerType, LongType, ShortType, StringType, TimestampNTZType, TimestampType}

/** Hidden partitioning transforms (Iceberg's `days(ts)` /
  * `truncate(w, col)` family) — the event-table partitioning idiom the
  * reference inherits via its Iceberg connector, re-expressed for this
  * engine's stats-pruned layout.
  *
  * Iceberg materializes the transform value into per-file partition
  * tuples and prunes by rewriting source-column predicates into
  * transform-space. This engine's scan already prunes on per-file
  * FOOTER ranges of the SOURCE column ([[FileSkipping]]), so a hidden
  * transform needs no read-side machinery at all — it is a WRITE-SIDE
  * CLUSTERING contract: every commit repartitions rows by the derived
  * value (each day/hour/prefix lands wholly in its own file set) and
  * sorts within by the source column, which makes the footer ranges
  * tight and disjoint, and `ts BETWEEN …` file-skips exactly like
  * Iceberg's partition pruning — WITHOUT the user ever referencing a
  * derived column (the "hidden" in hidden partitioning). Queries stay
  * `WHERE ts >= …`; no `WHERE day = …` leaks into user SQL, and
  * repartitioning the table never invalidates a query.
  *
  * Supported: `years|months|days|hours(tsCol)` (timestamp / ntz /
  * date sources) and `truncate(w, col)` (string prefix, integral
  * floor-to-width — Iceberg's semantics, exact for negatives too).
  * Transforms compose with identity columns and at most one
  * `bucket(n, col)` ([[Bucketing]]); the spec is stored in table
  * properties and versioned with the metadata like every other
  * layout fact.
  *
  * Boundaries (documented, spec-asserted): hidden transforms drive
  * clustering + stats pruning; DYNAMIC partition overwrite and
  * `compactWhere` address IDENTITY partitions only (as in Hive-style
  * engines) — an overwrite keyed by a transform value is expressed as
  * `overwrite-where` on the source column instead. */
object HiddenPartitioning {

  /** Table property: `;`-separated `func:col` / `truncate(w):col`. */
  val Prop = "graft.partition.transforms"

  private val Temporal = Set("years", "months", "days", "hours")
  private val TruncRe = """truncate\((\d+)\)""".r

  final case class HiddenTransform(func: String, width: Option[Int], col: String) {
    def encoded: String = width match {
      case Some(w) => s"truncate($w):$col"
      case None => s"$func:$col"
    }
    /** The clustering value — evaluated only inside the write path,
      * never stored in data or visible to readers. */
    def expr(c: Column, dt: DataType): Column = func match {
      case "years" | "months" | "days" | "hours" =>
        dt match {
          case TimestampType | TimestampNTZType | DateType =>
            date_trunc(func.dropRight(1), c) // years→year etc.
          case other => throw new IllegalArgumentException(
            s"$func($col) needs a timestamp/date column, got ${other.catalogString}")
        }
      case "truncate" =>
        val w = width.get
        dt match {
          case StringType => substring(c, 1, w)
          case IntegerType | LongType | ShortType =>
            // floor-to-width, exact for negatives: v - ((v % w + w) % w)
            c - ((c % w + w) % w)
          case other => throw new IllegalArgumentException(
            s"truncate($w, $col) needs a string or integral column, got ${other.catalogString}")
        }
    }
    def toV2: org.apache.spark.sql.connector.expressions.Transform = {
      import org.apache.spark.sql.connector.expressions.Expressions
      func match {
        case "years" => Expressions.years(col)
        case "months" => Expressions.months(col)
        case "days" => Expressions.days(col)
        case "hours" => Expressions.hours(col)
        case "truncate" =>
          Expressions.apply("truncate",
            Expressions.literal(Int.box(width.get)), Expressions.column(col))
      }
    }
  }

  def encode(ts: Seq[HiddenTransform]): Map[String, String] =
    if (ts.isEmpty) Map.empty else Map(Prop -> ts.map(_.encoded).mkString(";"))

  def specOf(properties: Map[String, String]): Seq[HiddenTransform] =
    properties.get(Prop).toSeq.flatMap(_.split(';').toSeq.filter(_.nonEmpty).map { s =>
      val i = s.lastIndexOf(':')
      require(i > 0, s"malformed hidden transform: $s")
      (s.take(i), s.drop(i + 1)) match {
        case (TruncRe(w), c) => HiddenTransform("truncate", Some(w.toInt), c)
        case (f, c) if Temporal(f) => HiddenTransform(f, None, c)
        case _ => throw new IllegalArgumentException(s"malformed hidden transform: $s")
      }
    })

  /** Parse the V2 transforms CREATE TABLE hands the catalog. Returns
    * the recognized hidden transforms; anything else is the caller's
    * (identity / bucket) or an error there. */
  def fromV2(
      ts: Seq[org.apache.spark.sql.connector.expressions.Transform]): Seq[HiddenTransform] =
    ts.map { t =>
      val colName = {
        require(t.references.length == 1, s"hidden transform needs one column: $t")
        t.references.head.fieldNames.mkString(".")
      }
      t.name match {
        case f if Temporal(f) => HiddenTransform(f, None, colName)
        case "truncate" =>
          val w = t.arguments.collectFirst {
            case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
              l.value.toString.toInt
          }.getOrElse(throw new IllegalArgumentException(
            s"truncate transform needs a width literal: $t"))
          require(w > 0, s"truncate width must be positive: $w")
          HiddenTransform("truncate", Some(w), colName)
        case other =>
          throw new UnsupportedOperationException(s"unsupported partition transform: $other")
      }
    }

  def isHidden(t: org.apache.spark.sql.connector.expressions.Transform): Boolean =
    Temporal(t.name) || t.name == "truncate"

  /** Fail at CREATE time, not first write: every transform column must
    * exist with a supported type. */
  def validate(schema: org.apache.spark.sql.types.StructType,
      properties: Map[String, String]): Unit =
    specOf(properties).foreach { t =>
      val f = schema.fields.find(_.name == t.col).getOrElse(
        throw new IllegalArgumentException(
          s"no such column for partition transform ${t.encoded}: ${t.col} " +
            s"(schema: ${schema.fieldNames.mkString(", ")})"))
      t.expr(col(t.col), f.dataType) // type check only; nothing evaluates
    }

  /** The write-side clustering columns for a table's hidden spec. */
  def clusteringExprs(
      data: org.apache.spark.sql.DataFrame,
      schema: org.apache.spark.sql.types.StructType,
      properties: Map[String, String]): Seq[Column] =
    specOf(properties).map { t =>
      val dt = schema.fields.find(_.name == t.col).map(_.dataType).getOrElse(
        throw new IllegalArgumentException(s"no such column: ${t.col}"))
      t.expr(data.col(t.col), dt)
    }

  /** Source columns of the hidden transforms — the within-partition
    * sort keys that make per-file footer ranges tight. */
  def sourceCols(properties: Map[String, String]): Seq[String] =
    specOf(properties).map(_.col)
}
