package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleaved scan of the prefix-filter dedup pipeline's pinned
  * partition width (graft.dedup.pinParts) for q28b/q37 — r20 follow-up
  * to the adaptive-vs-fixed A/B (1 partition lost 2.2×; is the
  * core-budget 32 actually better than 8/16?). */
object ProbeDedupWidth {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SessionTuning(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def releasePins(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    val widths = Seq("32", "16", "8", "4")
    val queries = Seq("q28b_ngram_jaccard", "q37_dedup_corpus")
      .map(n => n -> graft.SparkEntry.queries(n))
    queries.foreach { case (name, q) =>
      // warm
      q(spark, sfDir).count(); releasePins()
      val times = scala.collection.mutable.Map.empty[String, List[Double]]
      for (round <- 1 to 3; w <- if (round % 2 == 0) widths.reverse else widths) {
        spark.conf.set("graft.dedup.pinParts", w)
        val t0 = System.nanoTime()
        q(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        releasePins()
        times(w) = dt :: times.getOrElse(w, Nil)
      }
      spark.conf.unset("graft.dedup.pinParts")
      widths.foreach { w =>
        val ts = times(w)
        println(f"$name%-22s width=$w%-3s min=${ts.min}%.3f med=${ts.sorted.apply(ts.size / 2)}%.3f")
      }
    }
    spark.stop()
  }
}
