package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc stage timing probe (dev tool, not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Any): Double = {
      val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $name%-28s $dt%8.3fs  ($r)")
      dt
    }
    // Replicate Bench warm-up exactly.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").count()
    }
    // Scenario A: q29 in isolation (bench protocol: warm-up + min of 2).
    time("q29 iso warmup")(SparkEntry.queries("q29_cosine_topk")(spark, sfDir).count())
    val a1 = time("q29 iso t1")(SparkEntry.queries("q29_cosine_topk")(spark, sfDir).count())
    val a2 = time("q29 iso t2")(SparkEntry.queries("q29_cosine_topk")(spark, sfDir).count())
    println(f"[probe] q29 ISOLATION min = ${math.min(a1, a2)}%.3f")
    // Scenario B: replay every query that sorts before q29 (bench order),
    // then re-measure q29.
    val before = SparkEntry.queries.toSeq.sortBy(_._1).takeWhile(_._1 != "q29_cosine_topk")
    before.foreach { case (n, fn) =>
      try { fn(spark, sfDir).count(); (1 to 2).foreach(_ => fn(spark, sfDir).count()) }
      catch { case _: Throwable => () }
    }
    println(s"[probe] replayed ${before.size} preceding queries")
    time("q29 seq warmup")(SparkEntry.queries("q29_cosine_topk")(spark, sfDir).count())
    val b1 = time("q29 seq t1")(SparkEntry.queries("q29_cosine_topk")(spark, sfDir).count())
    val b2 = time("q29 seq t2")(SparkEntry.queries("q29_cosine_topk")(spark, sfDir).count())
    println(f"[probe] q29 IN-SEQUENCE min = ${math.min(b1, b2)}%.3f")
    spark.stop()
  }
}
