package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleaved A/B for the r20 adaptive pin partition count
  * (Materialize.adaptivePinPartitions): alternates
  * `graft.pin.adaptive` true/false on unchanged query code, min of
  * `rounds` per arm, reversed order each round so JIT warmth cannot
  * bias one arm. Usage:
  *   sbt "Test/runMain graft.tools.ProbePinAdaptiveAB q37 q28b ..."
  */
object ProbePinAdaptiveAB {
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
    val names = args.toSet
    val selected = graft.SparkEntry.allQueries
      .filter(q => names.contains(q.name) ||
        names.exists(n => q.name.startsWith(n + "_")))
    val rounds = sys.env.get("SPARK_GRAFT_AB_ROUNDS").flatMap(_.toIntOption).getOrElse(3)
    selected.foreach { q =>
      // warm both arms once
      Seq("true", "false").foreach { v =>
        spark.conf.set("graft.pin.adaptive", v)
        q.run(spark, sfDir).count(); releasePins()
      }
      var tAdaptive = List.empty[Double]
      var tFixed = List.empty[Double]
      def run(v: String): Double = {
        spark.conf.set("graft.pin.adaptive", v)
        val t0 = System.nanoTime()
        q.run(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        releasePins(); dt
      }
      for (r <- 1 to rounds) {
        if (r % 2 == 1) { tAdaptive ::= run("true"); tFixed ::= run("false") }
        else { tFixed ::= run("false"); tAdaptive ::= run("true") }
      }
      println(f"${q.name}%-26s adaptive=${tAdaptive.min}%6.3f (med ${tAdaptive.sorted.apply(rounds / 2)}%6.3f)  fixed=${tFixed.min}%6.3f (med ${tFixed.sorted.apply(rounds / 2)}%6.3f)")
    }
    spark.stop()
  }
}
