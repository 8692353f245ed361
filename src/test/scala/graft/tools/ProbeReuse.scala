package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Does exchange reuse fire at all under Bench's session conf?
  * A minimal self-join over an aggregate is the canonical
  * ReuseExchange case; print the executed plan and count scans. */
object ProbeReuse {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val agg = li.groupBy(col("l_suppkey")).agg(sum(col("l_quantity")).as("q"))
    val j = agg.as("a").join(agg.as("b"), "l_suppkey")
    j.collect() // executes THIS QueryExecution — final adaptive plan visible
    val p = j.queryExecution.executedPlan.toString
    println("== self-join executed plan ==")
    println(p)
    println("scan count: " + "FileScan".r.findAllIn(p).size)
    println("reused: " + "Reused".r.findAllIn(p).size)
    // and the real q98 final plan, executed the same way
    val q98 = graft.queries.TpcH.all.find(_.name == "q98_tpch_q11").get
    val df = q98.run(spark, sfDir)
    df.collect()
    val p2 = df.queryExecution.executedPlan.toString
    println("== q98 final ==")
    println(p2.take(4000))
    println("q98 scans: " + "FileScan".r.findAllIn(p2).size +
      " reused: " + "Reused".r.findAllIn(p2).size)
  }
}
