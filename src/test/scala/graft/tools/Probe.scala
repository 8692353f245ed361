package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc stage timing probe (dev tool, not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Any): Double = {
      val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $name%-28s $dt%8.3fs  ($r)")
      dt
    }
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/documents.parquet").count()
    // q37 stage breakdown (steady state: run everything once untimed)
    import graft.queries.TextOps
    (1 to 2).foreach { round =>
      println(s"[probe] --- round $round ---")
      time("shingle index")(TextOps.explodedShingles(spark, sfDir).count())
      time("pairs (prefix+verify)")(
        TextOps.jaccardPrefixJoin(TextOps.explodedShingles(spark, sfDir), 0.8).count())
      time("q37 end-to-end")(SparkEntry.queries("q37_dedup_corpus")(spark, sfDir).count())
    }
    spark.stop()
  }
}
