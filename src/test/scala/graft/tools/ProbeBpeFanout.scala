package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleaved scan of the BPE corpus fan-out width × AQE for q76 —
  * the 10-round learn loop's per-round job shape. */
object ProbeBpeFanout {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SessionTuning(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val q = graft.SparkEntry.queries("q76_bpe_merges")
    def releasePins(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    val variants = Seq(("32", "true"), ("16", "true"), ("8", "true"),
      ("32", "false"), ("8", "false"), ("1", "true"))
    // warm
    q(spark, sfDir).count(); releasePins()
    val times = scala.collection.mutable.Map.empty[(String, String), List[Double]]
    for (round <- 1 to 3; (f, aqe) <- if (round % 2 == 0) variants.reverse else variants) {
      spark.conf.set("graft.bpe.fanout", f)
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      val t0 = System.nanoTime()
      q(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      releasePins()
      times((f, aqe)) = dt :: times.getOrElse((f, aqe), Nil)
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    variants.foreach { case (f, aqe) =>
      val ts = times((f, aqe))
      println(f"fanout=$f%-3s aqe=$aqe%-5s min=${ts.min}%.3f med=${ts.sorted.apply(ts.size / 2)}%.3f")
    }
    spark.stop()
  }
}
