package graft

import org.apache.spark.sql.SparkSession

/** CLI twin of the reference's batch job
  * (`pyspark_jobs/iceberg_table_creation.py`): parse required --flags,
  * build a session with the lakehouse catalog registered, create
  * namespace×2, create the table, ingest a Parquet glob, and show the
  * result (R1–R16 in SURVEY.md §2A).
  *
  * Flags mirror the reference's argparse surface
  * (`iceberg_table_creation.py:98-160`) minus the GCP-only identifiers:
  *   --warehouse          local warehouse dir (was the GCS bucket)
  *   --catalog_name       spark catalog name
  *   --namespace_name     two-level namespace created beneath it
  *   --table_name         target table
  *   --source_data_parquet parquet path/glob to ingest
  *   [--table_ddl_cols]   optional column DDL; default = mtcars schema
  */
object Pipeline {

  private val required =
    Seq("warehouse", "catalog_name", "namespace_name", "table_name", "source_data_parquet")

  def parseArgs(args: Array[String]): Map[String, String] = {
    val parsed = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.stripPrefix("--") -> v
    }.toMap
    val missing = required.filterNot(parsed.contains)
    require(missing.isEmpty, s"missing required flags: ${missing.map("--" + _).mkString(", ")}")
    parsed
  }

  /** The reference's 12-column mtcars DDL (`iceberg_table_creation.py:71`). */
  val mtcarsDdl: String =
    "model STRING, mpg FLOAT, cyl INT, disp FLOAT, hp INT, drat FLOAT, " +
      "wt FLOAT, qsec FLOAT, vs INT, am FLOAT, gear INT, carb INT"

  def main(args: Array[String]): Unit = {
    val cfg = parseArgs(args)
    val cat = cfg("catalog_name")
    val spark = SparkSession.builder()
      .appName("Lakehouse table creation")
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.network.timeout", "50000") // the reference's one tuning knob
      .config("spark.sql.session.timeZone", "UTC")
      .config(s"spark.sql.catalog.$cat", "graft.catalog.LakehouseCatalog")
      .config(s"spark.sql.catalog.$cat.warehouse", cfg("warehouse"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val log = org.apache.log4j.LogManager.getLogger(getClass.getName)

    val ns = cfg("namespace_name")
    val tbl = s"$cat.$ns.${cfg("table_name")}"
    val ddl = cfg.getOrElse("table_ddl_cols", mtcarsDdl)

    log.info(s"creating namespace $cat.$ns")
    val nsParts = ns.split('.')
    nsParts.indices.foreach { i =>
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.${nsParts.take(i + 1).mkString(".")}")
    }
    log.info(s"creating table $tbl")
    spark.sql(s"CREATE TABLE IF NOT EXISTS $tbl ($ddl) TBLPROPERTIES('has_pii'='false')")

    log.info(s"ingesting ${cfg("source_data_parquet")}")
    spark.read.parquet(cfg("source_data_parquet"))
      .createOrReplaceTempView("temp_view_source_data")
    spark.sql(s"INSERT INTO $tbl SELECT * FROM temp_view_source_data")

    spark.sql(s"SELECT * FROM $tbl LIMIT 10").show(truncate = false)
    spark.sql(s"SELECT * FROM $tbl.snapshots").show(truncate = false)
    spark.stop()
  }
}
