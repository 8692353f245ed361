package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc stage timing probe (dev tool, not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val aqe = sys.env.getOrElse("PROBE_AQE", "true")
    val parts = sys.env.getOrElse("PROBE_PARTS", "16")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  ($r)")
    }
    spark.range(100).count()
    import graft.queries.TextOps
    import org.apache.spark.sql.functions._
    val tk = TextOps.tokenized(spark, sfDir)
    val sh = tk.filter(size(col("toks")) >= 3).select(col("doc_id"),
      array_distinct(transform(sequence(lit(0), size(col("toks")) - 3),
        i => concat_ws(" ", element_at(col("toks"), i + 1), element_at(col("toks"), i + 2),
          element_at(col("toks"), i + 3)))).as("sl"))
    val exx = sh.select(col("doc_id"), size(col("sl")).as("n"), explode(col("sl")).as("shingle"))
    time("exploded")(exx.count())
    time("exploded warm")(exx.count())
    exx.explain("formatted")
    // long-array variant: hash tokens once, shingle = xxhash of 3 hashes
    val hk = tk.filter(size(col("toks")) >= 3)
      .select(col("doc_id"), transform(col("toks"), t => xxhash64(t)).as("th"))
      .select(col("doc_id"), array_distinct(transform(sequence(lit(0), size(col("th")) - 3),
        i => xxhash64(element_at(col("th"), i + 1), element_at(col("th"), i + 2),
          element_at(col("th"), i + 3)))).as("sl"))
    val exl = hk.select(col("doc_id"), size(col("sl")).as("n"), explode(col("sl")).as("h"))
    time("long-hash ex")(exl.count())
    time("long-hash ex warm")(exl.count())
    val name = if (args.nonEmpty) args(0) else "q28b_ngram_jaccard"
    time(s"$name full") { SparkEntry.queries(name)(spark, sfDir).count() }
    spark.stop()
  }
}
