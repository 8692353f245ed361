import org.apache.spark.sql.SparkSession

/** Scratch harness: dump a query's rows + physical-plan stats, or sweep a
  * whole suite. Usage:
  *   runMain PlanDump <queryName> <sfDir> [outParquetDir]
  *   runMain PlanDump tpch <sfDir>          — stats for every TpcH query
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
    def stats(qname: String): org.apache.spark.sql.DataFrame = {
      val df = graft.SparkEntry.queries(qname)(spark, d)
      val t0 = System.nanoTime()
      val n = df.collect().length // finalizes THIS plan's AQE stages
      val sec = (System.nanoTime() - t0) / 1e9
      val plan = df.queryExecution.executedPlan.toString
      val fin = plan.indexOf("== Initial Plan ==") match {
        case -1 => plan
        case i => plan.substring(0, i)
      }
      def c(p: String) = p.r.findAllIn(fin).length
      println(f"$qname%-22s rows=$n%-7d sec=$sec%6.2f scans=${c("FileScan parquet")} " +
        s"bhj=${c("BroadcastHashJoin")} smj=${c("SortMergeJoin")} " +
        s"shuffles=${c("Exchange hashpartitioning")} reuse=${c("ReusedExchange")} " +
        s"bnlj=${c("BroadcastNestedLoopJoin")} cart=${c("CartesianProduct")}")
      df
    }
    if (name == "tpch") graft.queries.TpcH.all.foreach(q => stats(q.name))
    else {
      val df = stats(name)
      if (args.length > 2) df.coalesce(1).write.mode("overwrite").parquet(args(2))
      else println(df.queryExecution.executedPlan.toString.take(12000))
    }
    spark.stop()
  }
}
