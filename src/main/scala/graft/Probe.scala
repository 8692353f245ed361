package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.TextOps

/** Ad-hoc stage timing probe (dev tool, not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val parts = sys.env.getOrElse("PROBE_PARTS", "16")
    val spark = SparkSession.builder()
      .master("local[16]")
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

    val ex = TextOps.explodedShingles(spark, sfDir)
    time("ex count")(ex.count())
    val t = 0.8
    val freq = ex.groupBy(col("h")).agg(count(lit(1)).as("df"))
    time("freq")(freq.count())
    val w = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("h"))
    val prefix = ex.join(freq, Seq("h"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= col("n") - ceil(col("n") * t) + 1)
      .select(col("doc_id"), col("h"))
    time("prefix")(prefix.count())
    val cand = prefix.select(col("doc_id").as("id1"), col("h"))
      .join(prefix.select(col("doc_id").as("id2"), col("h")), Seq("h"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"))
      .distinct()
    time("cand")(cand.count())
    time("verify")(TextOps.verifyJaccard(cand, ex, t).count())
    time("q28b full")(SparkEntry.queries("q28b_ngram_jaccard")(spark, sfDir).count())
    time("q37 full")(SparkEntry.queries("q37_dedup_corpus")(spark, sfDir).count())
    time("q28c full")(SparkEntry.queries("q28c_minhash_lsh")(spark, sfDir).count())
    time("q04 full")(SparkEntry.queries("q04_multiway_join")(spark, sfDir).count())
    spark.stop()
  }
}
