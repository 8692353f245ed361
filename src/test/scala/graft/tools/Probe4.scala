package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc probe for the round-7 dedup-join pins: executed plans +
  * steady-state timings of q37/q28b/q53/q48 (dev tool, not part of the
  * driver contract). */
object Probe4 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/documents.parquet").count()
    val qs = Seq("q28b_ngram_jaccard", "q37_dedup_corpus", "q53_incremental_dedup",
      "q48_heavy_hitters")
    qs.foreach { q =>
      val df = SparkEntry.queries(q)(spark, sfDir)
      df.count() // materialize so AQE finalizes the plan
      val plan = df.queryExecution.executedPlan.toString
      val joins = plan.linesIterator.filter(l =>
        l.contains("Join") || l.contains("BroadcastExchange")).map(_.trim.take(140)).toSeq
      println(s"[plan] $q")
      joins.foreach(l => println(s"  $l"))
    }
    qs.foreach { q =>
      val samples = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $q%-24s min=${samples.min}%6.3fs med=${samples.sorted.apply(1)}%6.3fs max=${samples.max}%6.3fs")
    }
    spark.stop()
  }
}
