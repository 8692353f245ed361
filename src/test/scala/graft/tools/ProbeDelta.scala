package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: minimal merge-on-read MERGE against a fresh warehouse
  * with task retries disabled, so a delta-write task failure surfaces
  * as its ORIGINAL exception instead of a commit-denied retry loop. */
object ProbeDelta {
  def main(args: Array[String]): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("probe-wh-").toString
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.task.maxFailures", "1")
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
    spark.sql("ALTER TABLE lakehouse.ns.t SET TBLPROPERTIES ('write.merge.mode'='merge-on-read')")
    Seq((2, "b2", 99.0), (4, "d", 40.0)).toDF("id", "name", "amt")
      .createOrReplaceTempView("chg")
    try {
      spark.sql("""MERGE INTO lakehouse.ns.t t USING chg s ON t.id = s.id
                  |WHEN MATCHED THEN UPDATE SET t.name = s.name, t.amt = s.amt
                  |WHEN NOT MATCHED THEN INSERT (id, name, amt) VALUES (s.id, s.name, s.amt)
                  |""".stripMargin)
      spark.table("lakehouse.ns.t").orderBy("id").show()
    } catch { case e: Throwable => e.printStackTrace() }
    spark.stop()
  }
}
