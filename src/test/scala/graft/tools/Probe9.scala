package graft

import org.apache.spark.sql.SparkSession

/** Timing isolation for q37 at a given SF dir: 3 samples. Dev tool. */
object Probe9 {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.queries.TextOps.q37.run(spark, sf).collect()
      println(f"q37 sample $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
