package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.queries.TextOps

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
    val ex = TextOps.explodedShingles(spark, sfDir)
    time("ex")(ex.count())
    val minCols = (0 until 128).map(i => min(xxhash64(lit(i), col("h"))).as(s"m$i"))
    val sig = ex.groupBy(col("doc_id")).agg(minCols.head, minCols.tail: _*)
    time("sig")(sig.count())
    time("sig warm")(sig.count())
    val bands = sig.select(col("doc_id"),
        posexplode(array((0 until 32).map(j =>
          xxhash64(col(s"m${4 * j}"), col(s"m${4 * j + 1}"),
            col(s"m${4 * j + 2}"), col(s"m${4 * j + 3}"))): _*)))
      .toDF("doc_id", "band_idx", "band_sig")
    time("bands")(bands.count())
    val cand = bands.as("x")
      .join(bands.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_sig") === col("y.band_sig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"))
      .distinct()
    time("cand")(cand.count())
    time("verify")(TextOps.verifyJaccard(cand, ex, 0.8).count())
    val name = if (args.nonEmpty) args(0) else "q28b_ngram_jaccard"
    time(s"$name full") { SparkEntry.queries(name)(spark, sfDir).count() }
    spark.stop()
  }
}
