package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: A/B the pin (localCheckpoint materialization) cost for
  * the pinnedBy-carrying queries at sf0.1 — pin ON (production shape)
  * vs graft.checkpoint.disable=true (pass-through repartition, subtree
  * recomputed per consumer). Min of 3 timed samples per mode after a
  * warm-up; pins released between samples as Bench does. */
object ProbePin {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def releasePins(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    val qs = Seq("q38_pack_sequences", "q46_mix_corpora", "q71_source_similarity")
    for (name <- qs; mode <- Seq("pin", "nopin")) {
      spark.conf.set(graft.Materialize.DisableConf, (mode == "nopin").toString)
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir).count(); releasePins() // warm-up
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        releasePins(); dt
      }
      println(f"PROBE $name $mode min=${times.min}%.3f samples=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
