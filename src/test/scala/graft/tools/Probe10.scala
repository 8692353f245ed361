package graft

import org.apache.spark.sql.SparkSession

/** Debug exact filter pushdown on a partitioned table. Dev tool. */
object Probe10 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.aggpd")
    spark.sql("DROP TABLE IF EXISTS lakehouse.aggpd.part")
    spark.sql("CREATE TABLE lakehouse.aggpd.part (k BIGINT, p INT) PARTITIONED BY (p)")
    (1 to 300).map(i => (i.toLong, (i % 3).toInt)).toDF("k", "p")
      .createOrReplaceTempView("aggpd_psrc")
    spark.sql("INSERT INTO lakehouse.aggpd.part SELECT * FROM aggpd_psrc")
    val lt = spark.sessionState.catalogManager.catalog("lakehouse")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(Array("aggpd"), "part"))
      .asInstanceOf[graft.catalog.LakehouseTable]
    val meta = graft.catalog.TableMetadata.load(lt.tableDir)
    println("FILES: " + meta.files)
    meta.files.foreach(f => println(f + " -> " + meta.fileStats.get(f)))
    import org.apache.spark.sql.sources._
    for (flt <- Seq(EqualTo("p", 1), IsNotNull("p"))) {
      println(flt + " decidable=" + graft.catalog.FileSkipping.exactlyDecidable(
        meta.files, meta.fileStats, meta.schema, flt))
      meta.files.foreach { f =>
        val st = meta.fileStats.getOrElse(f, Map.empty)
        println(s"  $f may=${graft.catalog.FileSkipping.mayMatch(flt, meta.schema, st)} " +
          s"all=${graft.catalog.FileSkipping.provesAllMatch(flt, meta.schema, st)}")
      }
    }
    val q = spark.sql("SELECT count(*) FROM lakehouse.aggpd.part WHERE p = 1")
    q.collect()
    println(q.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
