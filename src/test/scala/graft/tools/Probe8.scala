package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Exchange census for the pinnedBy deployment: q28b and q64 executed
  * plans — how many shuffles remain and where. Dev tool only.
  */
object Probe8 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.001"
    for (q <- Seq(graft.queries.TextOps.q28b, graft.queries.TextOps.q64,
        graft.queries.TextOps.q38, graft.queries.TextOps.q46,
        graft.queries.TextOps.q65, graft.queries.TextOps.q71)) {
      val df = q.run(spark, sf)
      df.collect()
      def unwrap(p: org.apache.spark.sql.execution.SparkPlan) = p match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case other => other
      }
      val plan = unwrap(df.queryExecution.executedPlan).toString
      println(s"=== ${q.name} ===")
      println("exchanges: " + "Exchange hashpartitioning".r.findAllIn(plan).size)
      plan.linesIterator.filter(l =>
        l.contains("Exchange") || l.contains("Join") || l.contains("HashAggregate") ||
          l.contains("ExistingRDD")).foreach(println)
    }
    spark.stop()
  }
}
