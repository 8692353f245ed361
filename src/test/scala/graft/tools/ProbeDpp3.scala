package graft.tools
import org.apache.spark.sql.SparkSession
object ProbeDpp3 {
  def main(args: Array[String]): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("probe-wh3-").toString
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.lakehouse", "graft.catalog.LakehouseCatalog")
      .config("spark.sql.catalog.lakehouse.warehouse", wh)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    spark.sql("CREATE NAMESPACE lakehouse.ns")
    spark.sql("""CREATE TABLE lakehouse.ns.t (day STRING, id INT, v STRING)
                |PARTITIONED BY (day) TBLPROPERTIES ('write.merge.mode'='merge-on-read')""".stripMargin)
    Seq.tabulate(40)(i => ("2024-01-01", i, s"a$i")).toDF("day", "id", "v").createOrReplaceTempView("d1")
    spark.sql("INSERT INTO lakehouse.ns.t SELECT * FROM d1")
    spark.sql("CREATE TABLE lakehouse.ns.src (day STRING, id INT, v STRING)")
    Seq(("2024-01-02", 7, "B7")).toDF("day", "id", "v").createOrReplaceTempView("chg")
    spark.sql("INSERT INTO lakehouse.ns.src SELECT * FROM chg")
    val df = spark.sql("""EXPLAIN EXTENDED MERGE INTO lakehouse.ns.t t
                |USING (SELECT * FROM lakehouse.ns.src WHERE id = 7) s
                |ON t.day = s.day AND t.id = s.id
                |WHEN MATCHED THEN UPDATE SET t.v = s.v
                |WHEN NOT MATCHED THEN INSERT (day, id, v) VALUES (s.day, s.id, s.v)""".stripMargin)
    df.collect().foreach(r => println(r.getString(0)))
    spark.stop()
  }
}
