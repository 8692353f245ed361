package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B the BPE pin cadence (graft.bpe.pinEvery) on Bench's session
  * shape. Order alternates cadences to cancel JIT-warmth bias. */
object ProbeBpeCadence {
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
    val qs = Seq(graft.queries.TextOps.q76, graft.queries.TextOps.q79)
    // warm
    qs.foreach { q => q.run(spark, sfDir).count(); releasePins() }
    val cadences = Seq(3, 1, 2, 1, 3, 2) // interleaved
    val acc = scala.collection.mutable.Map.empty[(String, Int), List[Double]]
    cadences.foreach { c =>
      spark.conf.set("graft.bpe.pinEvery", c.toString)
      qs.foreach { q =>
        val t0 = System.nanoTime()
        q.run(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        releasePins()
        acc((q.name, c)) = dt :: acc.getOrElse((q.name, c), Nil)
      }
    }
    acc.toSeq.sortBy(_._1).foreach { case ((n, c), ts) =>
      println(f"$n cadence=$c min ${ts.min}%.3f  all ${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
