package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B a pin site on unchanged query code: graft.checkpoint.disable
  * turns every Materialize.pin into a pass-through. Interleaved order
  * cancels JIT warmth. Usage: Test/runMain graft.tools.ProbePinAB q98 q101 */
object ProbePinAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def releasePins(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    val names = args.toSet
    val qs = graft.SparkEntry.allQueries.filter(q => names.contains(q.name) ||
      names.exists(n => q.name.startsWith(n)))
    qs.foreach { q => q.run(spark, sfDir).count(); releasePins() }
    val acc = scala.collection.mutable.Map.empty[(String, String), List[Double]]
    Seq("false", "true", "false", "true", "false", "true").foreach { dis =>
      spark.conf.set(graft.Materialize.DisableConf, dis)
      qs.foreach { q =>
        val t0 = System.nanoTime()
        q.run(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        releasePins()
        acc((q.name, dis)) = dt :: acc.getOrElse((q.name, dis), Nil)
      }
    }
    spark.conf.unset(graft.Materialize.DisableConf)
    acc.toSeq.sortBy(_._1).foreach { case ((n, d), ts) =>
      println(f"$n disable=$d min ${ts.min}%.3f  all ${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
