package graft.tools

import org.apache.spark.sql.SparkSession

/** Optimization-round plan capture: dump `.explain("formatted")` for
  * the named queries (args, or a comma list in SPARK_GRAFT_ONLY) into
  * plans/<round>/<query>_<suffix>.txt. The session mirrors Bench's
  * exactly (same master/shuffle conf) so the captured plan is the plan
  * the bench times — AQE's initial plan; the final adaptive plan is
  * what the bench executes, but join strategy/exchange placement of
  * the initial plan is what code review checks.
  *
  * Usage: sbt "Test/runMain graft.tools.ProbePlans r19 before q04 q28b"
  */
object ProbePlans {
  def main(args: Array[String]): Unit = {
    val round = args.headOption.getOrElse("r19")
    val suffix = args.drop(1).headOption.getOrElse("before")
    val names = args.drop(2).toSet
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Paths.get("plans", round)
    java.nio.file.Files.createDirectories(dir)
    val selected = graft.SparkEntry.allQueries
      .filter(q => names.isEmpty || names.contains(q.name) ||
        names.exists(n => q.name.startsWith(n)))
    selected.foreach { q =>
      try {
        val df = q.run(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          dir.resolve(s"${q.name}_$suffix.txt"), plan)
        println(s"wrote ${q.name}_$suffix.txt (${plan.length} chars)")
      } catch {
        case e: Throwable =>
          println(s"FAILED ${q.name}: ${e.getClass.getSimpleName} ${Option(e.getMessage).getOrElse("").take(120)}")
      }
    }
    spark.stop()
  }
}
