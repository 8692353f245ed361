package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: _graft_row_id as a user-queryable column on clean and
  * dirty tables. */
object ProbeRowId {
  def main(args: Array[String]): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("probe-wh-").toString
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.lakehouse", "graft.catalog.LakehouseCatalog")
      .config("spark.sql.catalog.lakehouse.warehouse", wh)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    spark.sql("CREATE NAMESPACE lakehouse.ns")
    spark.sql("CREATE TABLE lakehouse.ns.t (id INT, name STRING, amt DOUBLE)")
    Seq((1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)).toDF("id", "name", "amt")
      .createOrReplaceTempView("src")
    spark.sql("INSERT INTO lakehouse.ns.t SELECT * FROM src")
    println("=== clean: explain ===")
    spark.sql("SELECT id, _graft_row_id.file AS f, _graft_row_id.pos AS p FROM lakehouse.ns.t")
      .explain(true)
    println("=== clean: rows ===")
    spark.sql("SELECT id, _graft_row_id.file AS f, _graft_row_id.pos AS p FROM lakehouse.ns.t")
      .show(10, false)
    spark.sql("""ALTER TABLE lakehouse.ns.t SET TBLPROPERTIES
                |('graft.delete.mode'='merge-on-read')""".stripMargin)
    spark.sql("DELETE FROM lakehouse.ns.t WHERE id = 2")
    println("=== dirty: explain ===")
    spark.sql("SELECT id FROM lakehouse.ns.t WHERE _graft_row_id.pos >= 0 ORDER BY id")
      .explain(true)
    println("=== dirty: rows ===")
    spark.sql("SELECT id FROM lakehouse.ns.t WHERE _graft_row_id.pos >= 0 ORDER BY id")
      .show(10, false)
    spark.stop()
  }
}
