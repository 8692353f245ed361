package graft

import org.apache.spark.sql.SparkSession

/** Exchange-reuse probe for the pinned jaccard pipeline (dev tool). */
object Probe5 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/documents.parquet").count()
    val df = SparkEntry.queries("q28b_ngram_jaccard")(spark, sfDir)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    def cnt(p: String) = p.r.findAllIn(plan).size
    println(s"[probe5] Exchange=${cnt("Exchange (hash|range)")} ReusedExchange=${cnt("ReusedExchange")} " +
      s"Scan=${cnt("FileScan|Scan parquet")} ShuffledHashJoin=${cnt("ShuffledHashJoin")} " +
      s"ObjectHashAggregate=${cnt("ObjectHashAggregate")}")
    plan.linesIterator.filter(l => l.contains("Exchange") || l.contains("Scan parq") ||
      l.contains("FileScan")).take(30).foreach(l => println("  " + l.trim.take(150)))
    spark.stop()
  }
}
