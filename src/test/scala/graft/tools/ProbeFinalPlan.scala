package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the FINAL adaptive plan (post-execution) for named queries —
  * shows whether AQE stage reuse actually deduped repeated subtrees
  * (ReusedExchange / table cache hits are invisible in the initial
  * plan ProbePlans captures). */
object ProbeFinalPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = args.toSet
    graft.SparkEntry.allQueries
      .filter(q => names.contains(q.name) || names.exists(n => q.name.startsWith(n)))
      .foreach { q =>
        val df = q.run(spark, sfDir)
        // collect() executes THIS dataset's queryExecution — count()
        // builds a NEW plan and would leave df's own adaptive plan
        // unexecuted (isFinalPlan=false), the exact trap the r19
        // finding-7 probe fell into
        df.collect()
        println(s"===== ${q.name} FINAL =====")
        println(df.queryExecution.executedPlan.toString.take(12000))
      }
    spark.stop()
  }
}
