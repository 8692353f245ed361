package graft.tools
import org.apache.spark.sql.SparkSession
object ProbeDpp2 {
  def main(args: Array[String]): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("probe-wh2-").toString
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.lakehouse", "graft.catalog.LakehouseCatalog")
      .config("spark.sql.catalog.lakehouse.warehouse", wh)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.planChangeLog.level", "error")
      .config("spark.sql.planChangeLog.rules",
        "org.apache.spark.sql.catalyst.optimizer.CleanupDynamicPruningFilters," +
        "org.apache.spark.sql.execution.datasources.v2.V2ScanRelationPushDown," +
        "org.apache.spark.sql.catalyst.optimizer.PartitionPruning")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    spark.sql("CREATE NAMESPACE lakehouse.ns")
    spark.sql("""CREATE TABLE lakehouse.ns.t (day STRING, id INT, v STRING)
                |PARTITIONED BY (day) TBLPROPERTIES ('write.merge.mode'='merge-on-read')
                |""".stripMargin)
    Seq.tabulate(40)(i => ("2024-01-01", i, s"a$i")).toDF("day", "id", "v").createOrReplaceTempView("d1")
    spark.sql("INSERT INTO lakehouse.ns.t SELECT * FROM d1")
    Seq.tabulate(40)(i => ("2024-01-02", i, s"b$i")).toDF("day", "id", "v").createOrReplaceTempView("d2")
    spark.sql("INSERT INTO lakehouse.ns.t SELECT * FROM d2")
    spark.sql("CREATE TABLE lakehouse.ns.src (day STRING, id INT, v STRING)")
    Seq(("2024-01-02", 7, "B7")).toDF("day", "id", "v").createOrReplaceTempView("chg")
    spark.sql("INSERT INTO lakehouse.ns.src SELECT * FROM chg")
    // non-literal source filter: id IN (subset) — selective but NOT a literal day
    // predicate, so nothing is inferable on day and only the runtime filter can prune
    spark.sql("""MERGE INTO lakehouse.ns.t t
                |USING (SELECT * FROM lakehouse.ns.src WHERE id = 7) s
                |ON t.day = s.day AND t.id = s.id
                |WHEN MATCHED THEN UPDATE SET t.v = s.v
                |""".stripMargin)
    println(s"RUNTIME=${graft.catalog.LakehouseTable.lastRuntimeFilteredCounts} STATIC=${graft.catalog.LakehouseTable.lastPositionalScanFileCounts}")
    // right-outer shape (NOT MATCHED insert) — THE daily-upsert pattern,
    // on a FRESH (clean) table: a dirty target is rewritten by MorReads
    // and correctly skips this rule
    spark.sql("""CREATE TABLE lakehouse.ns.t2 (day STRING, id INT, v STRING)
                |PARTITIONED BY (day) TBLPROPERTIES ('write.merge.mode'='merge-on-read')""".stripMargin)
    spark.sql("INSERT INTO lakehouse.ns.t2 SELECT * FROM d1")
    spark.sql("INSERT INTO lakehouse.ns.t2 SELECT * FROM d2")
    graft.catalog.LakehouseTable.lastRuntimeFilteredCounts = (-1, -1)
    spark.sql("""MERGE INTO lakehouse.ns.t2 t
                |USING (SELECT * FROM lakehouse.ns.src WHERE id = 7) s
                |ON t.day = s.day AND t.id = s.id
                |WHEN MATCHED THEN UPDATE SET t.v = s.v
                |WHEN NOT MATCHED THEN INSERT (day, id, v) VALUES (s.day, s.id, s.v)
                |""".stripMargin)
    println(s"OUTER RUNTIME=${graft.catalog.LakehouseTable.lastRuntimeFilteredCounts} STATIC=${graft.catalog.LakehouseTable.lastPositionalScanFileCounts}")
    spark.stop()
  }
}
