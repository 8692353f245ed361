package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: does a partition-selective merge-on-read MERGE get a
  * runtime (DPP) filter on its delta target scan? Prints the physical
  * plan of the MERGE. */
object ProbeDpp {
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
    spark.sql("""CREATE TABLE lakehouse.ns.t (day STRING, id INT, v STRING)
                |PARTITIONED BY (day) TBLPROPERTIES ('write.merge.mode'='merge-on-read')
                |""".stripMargin)
    Seq.tabulate(40)(i => ("2024-01-01", i, s"a$i")).toDF("day", "id", "v")
      .createOrReplaceTempView("d1")
    spark.sql("INSERT INTO lakehouse.ns.t SELECT * FROM d1")
    Seq.tabulate(40)(i => ("2024-01-02", i, s"b$i")).toDF("day", "id", "v")
      .createOrReplaceTempView("d2")
    spark.sql("INSERT INTO lakehouse.ns.t SELECT * FROM d2")
    spark.sql("CREATE TABLE lakehouse.ns.src (day STRING, id INT, v STRING)")
    Seq(("2024-01-02", 7, "B7")).toDF("day", "id", "v").createOrReplaceTempView("chg")
    spark.sql("INSERT INTO lakehouse.ns.src SELECT * FROM chg")

    val merge = """MERGE INTO lakehouse.ns.t t
                  |USING (SELECT * FROM lakehouse.ns.src WHERE day = '2024-01-02') s
                  |ON t.day = s.day AND t.id = s.id
                  |WHEN MATCHED THEN UPDATE SET t.v = s.v
                  |WHEN NOT MATCHED THEN INSERT (day, id, v) VALUES (s.day, s.id, s.v)
                  |""".stripMargin
    println("=== EXPLAIN default ===")
    spark.sql(s"EXPLAIN FORMATTED $merge").collect().foreach(r => println(r.getString(0)))
    println("=== EXPLAIN reuseBroadcastOnly=false ===")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", "false")
    spark.sql(s"EXPLAIN FORMATTED $merge").collect().foreach(r => println(r.getString(0)))
    spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly")
    val mergeStatic = """MERGE INTO lakehouse.ns.t t
                  |USING (SELECT * FROM lakehouse.ns.src WHERE day = '2024-01-02') s
                  |ON t.day = s.day AND t.id = s.id AND t.day = '2024-01-02'
                  |WHEN MATCHED THEN UPDATE SET t.v = s.v
                  |WHEN NOT MATCHED THEN INSERT (day, id, v) VALUES (s.day, s.id, s.v)
                  |""".stripMargin
    println("=== EXPLAIN static conjunct ===")
    spark.sql(s"EXPLAIN FORMATTED $mergeStatic").collect().foreach(r => println(r.getString(0)))

    // matched-only MERGE: inner join, source broadcastable → can the
    // default DPP (reuseBroadcastOnly=true) fire on the target scan?
    val mergeMatchedOnly = """MERGE INTO lakehouse.ns.t t
                  |USING (SELECT * FROM lakehouse.ns.src WHERE day = '2024-01-02') s
                  |ON t.day = s.day AND t.id = s.id
                  |WHEN MATCHED THEN UPDATE SET t.v = s.v
                  |""".stripMargin
    println("=== EXPLAIN matched-only (default confs) ===")
    spark.sql(s"EXPLAIN FORMATTED $mergeMatchedOnly").collect().foreach(r => println(r.getString(0)))
    println("=== FULL PLAN matched-only reuseBroadcastOnly=false ===")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", "false")
    val qe = spark.sql(s"EXPLAIN EXTENDED $mergeMatchedOnly").collect()
      .foreach(r => println(r.getString(0)))
    spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly")
    graft.catalog.LakehouseTable.lastRuntimeFilteredCounts = (-1, -1)
    spark.sql(mergeMatchedOnly)
    println(s"=== matched-only EXEC: lastRuntimeFilteredCounts = ${
      graft.catalog.LakehouseTable.lastRuntimeFilteredCounts}, lastPositionalScanFileCounts = ${
      graft.catalog.LakehouseTable.lastPositionalScanFileCounts} ===")

    println("=== EXEC with-not-matched (default confs) ===")
    graft.catalog.LakehouseTable.lastRuntimeFilteredCounts = (-1, -1)
    spark.sql(merge)
    println(s"=== not-matched EXEC: lastRuntimeFilteredCounts = ${
      graft.catalog.LakehouseTable.lastRuntimeFilteredCounts}, lastPositionalScanFileCounts = ${
      graft.catalog.LakehouseTable.lastPositionalScanFileCounts} ===")
    spark.stop()
  }
}
