package graft.tools

import org.apache.spark.sql.SparkSession

/** Where does the wall time of a bench sample go? For each named query
  * (min of 3, Bench-style), split:
  *   build  = q.run(spark, sfDir)            — DataFrame construction
  *            (includes any driver-side loops the query runs eagerly)
  *   exec   = .count() on the fresh frame    — analysis+optimize+execute
  *   reexec = .count() again on the SAME frame — execution only
  *            (analysis/optimization cached in the QueryExecution)
  * exec − reexec ≈ catalyst analysis + optimization + initial planning
  * cost paid per bench sample; reexec ≈ AQE scheduling + task compute.
  */
object ProbePhases {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = args.toSet
    val selected = graft.SparkEntry.allQueries
      .filter(q => names.isEmpty || names.contains(q.name) ||
        names.exists(n => q.name.startsWith(n)))
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").count()
    }
    def releasePins(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    println(f"${"query"}%-28s ${"build_s"}%8s ${"exec_s"}%8s ${"reexec_s"}%9s")
    selected.foreach { q =>
      try {
        q.run(spark, sfDir).count(); releasePins() // warm-up
        var bBuild = Double.MaxValue; var bExec = Double.MaxValue
        var bRe = Double.MaxValue
        (1 to 3).foreach { _ =>
          val t0 = System.nanoTime()
          val df = q.run(spark, sfDir)
          val t1 = System.nanoTime()
          df.count()
          val t2 = System.nanoTime()
          df.count()
          val t3 = System.nanoTime()
          releasePins()
          bBuild = bBuild.min((t1 - t0) / 1e9)
          bExec = bExec.min((t2 - t1) / 1e9)
          bRe = bRe.min((t3 - t2) / 1e9)
        }
        println(f"${q.name}%-28s $bBuild%8.3f $bExec%8.3f $bRe%9.3f")
      } catch {
        case e: Throwable => println(s"${q.name} FAILED ${e.getClass.getSimpleName}")
      }
    }
    spark.stop()
  }
}
