package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: changelog rows of a merge-on-read MERGE delta commit. */
object ProbeClog {
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
    spark.sql("CREATE NAMESPACE lakehouse.cdc")
    spark.sql("""CREATE TABLE lakehouse.cdc.md (k BIGINT, v STRING)
                |TBLPROPERTIES ('write.merge.mode'='merge-on-read')""".stripMargin)
    (1L to 5L).map(k => (k, s"a$k")).toDF("k", "v").createOrReplaceTempView("s1")
    spark.sql("INSERT INTO lakehouse.cdc.md SELECT * FROM s1")
    Seq((2L, "B2"), (6L, "NEW")).toDF("k", "v").createOrReplaceTempView("s2")
    spark.sql("""MERGE INTO lakehouse.cdc.md t USING s2 s ON t.k = s.k
                |WHEN MATCHED THEN UPDATE SET t.v = s.v
                |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)
                |""".stripMargin)
    println("=== table ===")
    spark.table("lakehouse.cdc.md").orderBy("k").show()
    println("=== changelog 2..3 ===")
    graft.catalog.Maintenance.changelogBetween(
      spark, "lakehouse", Seq("cdc"), "md", 2, 3).show(50, false)
    val dir = java.nio.file.Paths.get(s"$wh/cdc/md")
    val meta = graft.catalog.TableMetadata.load(dir)
    println("deleteFiles=" + meta.deleteFiles)
    println("fileSeq=" + meta.fileSeq)
    val prev = graft.catalog.TableMetadata.loadFile(dir,
      graft.catalog.TableMetadata.versionFile(dir, 2))
    val probe = prev.copy(deleteFiles = meta.deleteFiles)
    prev.files.foreach { f =>
      println(s"applicable($f) = " + graft.catalog.MergeOnRead.applicable(probe, f))
    }
    spark.stop()
  }
}
