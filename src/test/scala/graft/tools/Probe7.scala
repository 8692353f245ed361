package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Does Materialize.pin preserve hash partitioning for downstream
  * aggregation/join reuse? Prints the pinned frame's output
  * partitioning and the re-agg plan. Dev tool only.
  */
object Probe7 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.range(1000000L)
      .select((col("id") % 7919).as("p"), (col("id") % 31).as("w"),
        (col("id") % 1000).as("doc"))
      .repartition(col("p"), col("w"))
      .groupBy("doc", "p", "w").agg(count(lit(1)).as("k"))
    val pinned = Materialize.pin(df)
    println("PIN PARTITIONING: " +
      pinned.queryExecution.executedPlan.outputPartitioning)
    val agg = pinned.groupBy("p", "w").agg(sum("k").as("c2"))
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
    println("REAGG HAS EXCHANGE: " + plan.contains("Exchange"))
    println(plan.linesIterator.take(12).mkString("\n"))

    val pinnedBy = Materialize.pinPartitionedBy(df, 8, Seq("p", "w"))
    println("PINBY PARTITIONING: " +
      pinnedBy.queryExecution.executedPlan.outputPartitioning)
    val agg2 = pinnedBy.groupBy("p", "w").agg(sum("k").as("c2"))
    agg2.collect()
    val plan2 = agg2.queryExecution.executedPlan.toString
    println("PINBY REAGG HAS EXCHANGE: " + plan2.contains("Exchange"))
    println(plan2.linesIterator.take(12).mkString("\n"))
    spark.stop()
  }
}
