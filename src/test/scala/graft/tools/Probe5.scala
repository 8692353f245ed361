package graft

import org.apache.spark.sql.SparkSession

/** Redundant-scan probe: how many times does each query's executed
  * plan scan the documents table? (dev tool) */
object Probe5 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/documents.parquet").count()
    Seq("q28b_ngram_jaccard", "q45b_decontaminate_bloom", "q60_contamination",
      "q57_oov_rate", "q42_tfidf", "q42b_bm25", "q62_lm_score", "q30c_lang_hist",
      "q44_curate", "q56_chunk_docs", "q58b_split_budget").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sfDir)
      df.count()
      val plan = df.queryExecution.executedPlan.toString
      val scans = "FileScan parquet".r.findAllIn(plan).size
      val reused = "ReusedExchange".r.findAllIn(plan).size
      println(f"[probe5] $q%-26s FileScan=$scans ReusedExchange=$reused")
    }
    spark.stop()
  }
}
