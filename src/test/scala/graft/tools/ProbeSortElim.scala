package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbeSortElim {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .select(col("l_orderkey"), upper(col("l_returnflag")).as("rf"))
      .orderBy(col("l_orderkey"), col("rf"))
    // what the bench times:
    val counted = df.groupBy().count()
    println("== count-over-orderBy optimized plan ==")
    println(counted.queryExecution.optimizedPlan.toString)
    println("has Sort: " + counted.queryExecution.optimizedPlan.toString.contains("Sort"))
    println("has upper: " + counted.queryExecution.optimizedPlan.toString.contains("upper"))
    spark.stop()
  }
}
