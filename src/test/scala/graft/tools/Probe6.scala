package graft

import org.apache.spark.sql.SparkSession
import graft.catalog.{Maintenance, TableMetadata}

/** Branch-delete fast-forward repro (dev tool). */
object Probe6 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.catalog.lakehouse", "graft.catalog.LakehouseCatalog")
      .config("spark.sql.catalog.lakehouse.warehouse",
        java.nio.file.Files.createTempDirectory("p6-wh-").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    spark.sql("CREATE NAMESPACE lakehouse.ns")
    spark.sql("CREATE TABLE lakehouse.ns.t (k INT, v STRING)")
    Seq((1, "a"), (2, "b")).toDF("k", "v").createOrReplaceTempView("src")
    spark.sql("INSERT INTO lakehouse.ns.t SELECT * FROM src")
    Maintenance.createBranch(spark, "lakehouse", Seq("ns"), "t", "stage")
    Seq((1, "dup"), (30, "new")).toDF("k", "v").createOrReplaceTempView("w")
    Maintenance.appendToBranch(spark, "lakehouse", Seq("ns"), "t", "stage", spark.table("w"))
    println("[p6] branch delete keys=" + Maintenance.morDeleteFromBranch(
      spark, "lakehouse", Seq("ns"), "t", "stage", Seq(1).toDF("k")))
    println("[p6] audit=" + spark.sql("SELECT k FROM lakehouse.ns.t VERSION AS OF 'stage'")
      .collect().map(_.getInt(0)).sorted.mkString(","))
    println("[p6] ff -> " + Maintenance.fastForward(spark, "lakehouse", Seq("ns"), "t", "stage"))
    val dir = spark.sessionState.catalogManager.catalog("lakehouse")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(Array("ns"), "t"))
      .asInstanceOf[graft.catalog.LakehouseTable].tableDir
    val meta = TableMetadata.load(dir)
    println("[p6] main version=" + meta.version + " files=" + meta.files.size +
      " dels=" + meta.deleteFiles.map(d => s"${d.path}@seq${d.seq}").mkString(";"))
    println("[p6] fileSeq=" + meta.fileSeq.toSeq.sortBy(_._1).map { case (f, s) =>
      f.take(30) + "->" + s }.mkString(","))
    println("[p6] main rows=" + spark.table("lakehouse.ns.t")
      .collect().map(r => r.getInt(0) + ":" + r.getString(1)).sorted.mkString(","))
    spark.stop()
  }
}
