package graft.catalog

import java.util.OptionalLong

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
import org.apache.spark.sql.connector.read.colstats.ColumnStatistics
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table- and column-level statistics for cost-based optimization —
  * the `ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS` surface.
  *
  * A 1000-executor join reorder lives or dies on cardinality
  * estimates: Spark's CBO (`spark.sql.cbo.enabled` +
  * `spark.sql.optimizer.joinReorder.enabled`) ranks join trees by
  * row-count × distinct-value estimates, and a DSv2 relation only
  * participates when its scan reports
  * [[org.apache.spark.sql.connector.read.Statistics#columnStats]]
  * (`DataSourceV2Relation.transformV2Stats` maps them onto catalyst
  * attributes by name). `analyze` computes the numbers in ONE
  * distributed pass — count + HLL++ distinct + null counts + string
  * lengths, all partially aggregated map-side — and publishes them as
  * table properties in a metadata commit; the scan then serves them to
  * every subsequent planning cycle for free.
  *
  * Stats are a snapshot (property `graft.stats.version` records which
  * one) and drift as the table grows — like every warehouse, re-run
  * analyze after bulk loads. Estimates only steer plan CHOICE, never
  * results, so staleness is safe.
  */
object TableStats {

  val NumRowsProp = "graft.stats.numRows"
  val VersionProp = "graft.stats.version"
  def colProp(c: String): String = s"graft.stats.col.$c"

  /** ndv:nullCount[:avgLen:maxLen] */
  private def encode(ndv: Long, nulls: Long, avgLen: Option[Long], maxLen: Option[Long]) =
    s"$ndv:$nulls${avgLen.zip(maxLen).map { case (a, m) => s":$a:$m" }.getOrElse("")}"

  private def analyzable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType |
         StringType | BooleanType | DateType | TimestampType | BinaryType => true
    case _: DecimalType => true
    case _ => false
  }

  /** One-pass stats collection over the current snapshot; returns the
    * analyzed row count. `columns` defaults to every atomic-typed
    * column. */
  def analyze(
      spark: SparkSession,
      catalog: String,
      namespace: Seq[String],
      table: String,
      columns: Seq[String] = Nil): Long = {
    val lt = Maintenance.lakehouseTable(spark, catalog, namespace, table)
    val dir = lt.tableDir
    val current = TableMetadata.load(dir)
    val cols =
      if (columns.nonEmpty) {
        columns.foreach { c =>
          val f = current.schema.fields.find(_.name == c)
            .getOrElse(throw new IllegalArgumentException(s"no such column: $c"))
          require(analyzable(f.dataType),
            s"analyze unsupported for ${f.dataType.simpleString} column $c")
        }
        columns
      } else current.schema.fields.filter(f => analyzable(f.dataType)).map(_.name).toSeq

    val (numRows, colStats) =
      if (current.files.isEmpty) (0L, cols.map(c => c -> encode(0L, 0L, None, None)))
      else {
        val df = spark.read.schema(current.schema)
          .parquet(current.files.map(f => dir.resolve(f).toString): _*)
        val isString = cols.map(c =>
          c -> current.schema(c).dataType.isInstanceOf[StringType]).toMap
        val aggCols = count(lit(1)).as("__n") +: cols.flatMap { c =>
          Seq(
            approx_count_distinct(col(c)).as(s"__ndv_$c"),
            sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c")) ++
            (if (isString(c)) Seq(
              avg(length(col(c))).as(s"__avglen_$c"),
              max(length(col(c))).as(s"__maxlen_$c"))
            else Nil)
        }
        val r = df.agg(aggCols.head, aggCols.tail: _*).head()
        val n = r.getLong(r.fieldIndex("__n"))
        (n, cols.map { c =>
          val lens =
            if (isString(c) && !r.isNullAt(r.fieldIndex(s"__avglen_$c")))
              (Some(math.ceil(r.getDouble(r.fieldIndex(s"__avglen_$c"))).toLong),
                Some(r.getInt(r.fieldIndex(s"__maxlen_$c")).toLong))
            else (None, None)
          c -> encode(
            r.getLong(r.fieldIndex(s"__ndv_$c")),
            r.getLong(r.fieldIndex(s"__nulls_$c")),
            lens._1, lens._2)
        })
      }

    val cur = TableMetadata.load(dir)
    TableMetadata.commit(dir, cur.copy(
      version = cur.version + 1,
      properties = cur.properties ++
        Map(NumRowsProp -> numRows.toString, VersionProp -> cur.version.toString) ++
        colStats.map { case (c, v) => colProp(c) -> v },
      snapshots = cur.snapshots :+ Snapshot(
        cur.version + 1, System.currentTimeMillis(), "analyze", 0, cur.files.size)))
    numRows
  }

  /** Recorded row count, if the table was analyzed. */
  def numRows(properties: Map[String, String]): Option[Long] =
    properties.get(NumRowsProp).flatMap(s => scala.util.Try(s.toLong).toOption)

  /** Recorded per-column stats as the DSv2 interface objects. */
  def columnStats(
      properties: Map[String, String],
      schema: StructType): Map[String, ColumnStatistics] =
    schema.fieldNames.flatMap { c =>
      properties.get(colProp(c)).flatMap { s =>
        val parts = s.split(':')
        scala.util.Try {
          val ndv = parts(0).toLong
          val nulls = parts(1).toLong
          val (avgL, maxL) =
            if (parts.length >= 4) (OptionalLong.of(parts(2).toLong), OptionalLong.of(parts(3).toLong))
            else (OptionalLong.empty(), OptionalLong.empty())
          new ColumnStatistics {
            override def distinctCount(): OptionalLong = OptionalLong.of(ndv)
            override def nullCount(): OptionalLong = OptionalLong.of(nulls)
            override def avgLen(): OptionalLong = avgL
            override def maxLen(): OptionalLong = maxL
          }: ColumnStatistics
        }.toOption
      }.map(c -> _)
    }.toMap
}
