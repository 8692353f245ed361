package graft.tools

import org.apache.spark.sql.SparkSession

object ProbeHidden {
  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.hpp_ns")
    spark.sql("DROP TABLE IF EXISTS lakehouse.hpp_ns.ev")
    spark.sql(
      "CREATE TABLE lakehouse.hpp_ns.ev (ev_id BIGINT, ts TIMESTAMP, v STRING) " +
        "PARTITIONED BY (days(ts))")
    val lt = spark.sessionState.catalogManager.catalog("lakehouse")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(Array("hpp_ns"), "ev"))
    println("PROPS " + lt.properties())
    println("PARTS " + lt.partitioning().toSeq)
    import spark.implicits._
    val rows = (0 until 300).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2026-03-${i % 3 + 1}%02d 08:00:00"), s"v$i")
    }
    rows.toDF("ev_id", "ts", "v").createOrReplaceTempView("hpp_src")
    spark.sql("INSERT INTO lakehouse.hpp_ns.ev SELECT * FROM hpp_src")
    println("FILES " + spark.sql("SELECT file_path FROM lakehouse.hpp_ns.ev.files")
      .collect().map(_.getString(0)).toSeq)
    spark.stop()
  }
}

object ProbeHidden2 {
  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = (0 until 300).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2026-03-${i % 3 + 1}%02d 08:00:00"), s"v$i")
    }
    val df = rows.toDF("ev_id", "ts", "v")
    val exprs = graft.catalog.HiddenPartitioning.clusteringExprs(df,
      df.schema, Map("graft.partition.transforms" -> "days:ts"))
    println("EXPRS " + exprs)
    val rp = df.repartitionByRange(exprs: _*)
    println("PARTS " + rp.rdd.getNumPartitions + " nonEmpty " +
      rp.rdd.mapPartitions(it => Iterator(it.size)).collect().toSeq)
    spark.stop()
  }
}
