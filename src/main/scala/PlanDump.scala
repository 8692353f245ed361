import org.apache.spark.sql.SparkSession

/** Scratch harness: dump one query's rows + physical-plan stats.
  * Usage: runMain PlanDump <queryName> <sfDir> [outParquetDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = args(0)
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val df = graft.SparkEntry.queries(name)(spark, d)
    println(s"rows=${df.collect().length}")  // finalizes THIS plan's AQE stages
    val plan = df.queryExecution.executedPlan.toString
    def c(p: String) = p.r.findAllIn(plan).length
    println(s"scans=${c("Scan parquet")} bhj=${c("BroadcastHashJoin")} " +
      s"smj=${c("SortMergeJoin")} shuffles=${c("Exchange hashpartitioning")} " +
      s"reuse=${c("ReusedExchange|ReusedQueryStage|reused")}")
    if (args.length > 2) df.coalesce(1).write.mode("overwrite").parquet(args(2))
    else { df.show(3, truncate = false); println(df.queryExecution.executedPlan.toString.take(8000)) }
    spark.stop()
  }
}
