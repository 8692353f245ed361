package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage timing probe (dev tool, not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val parts = sys.env.getOrElse("PROBE_PARTS", "32")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  ($r)")
    }
    spark.range(100).count()
    time("q28b cold")(SparkEntry.queries("q28b_ngram_jaccard")(spark, sfDir).count())
    time("q28b warm")(SparkEntry.queries("q28b_ngram_jaccard")(spark, sfDir).count())
    time("q28b warm2")(SparkEntry.queries("q28b_ngram_jaccard")(spark, sfDir).count())
    time("q37 warm")(SparkEntry.queries("q37_dedup_corpus")(spark, sfDir).count())
    time("q28c warm")(SparkEntry.queries("q28c_minhash_lsh")(spark, sfDir).count())
    spark.stop()
  }
}
