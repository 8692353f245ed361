package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Interleaved A/B: decimal(18,2)-sum vs long-cents sum over the
  * lineitem (l_partkey, l_suppkey) aggregation — the ps() hot loop —
  * plus a value-identity check over every group. */
object ProbeCentsAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SessionTuning(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def dec() = li.groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast(DoubleType).as("q"))
    def cents() = li.groupBy(col("l_partkey"), col("l_suppkey"))
      .agg((sum(round(col("l_quantity") * 100.0).cast(LongType))
        .cast(DoubleType) / 100.0).as("q"))
    // value identity over EVERY group (exact double equality)
    val diff = dec().withColumnRenamed("q", "qd")
      .join(cents(), Seq("l_partkey", "l_suppkey"))
      .filter(col("qd") =!= col("q")).count()
    println(s"groups differing: $diff")
    def time(f: () => Unit): Double = {
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }
    var td = List.empty[Double]; var tc = List.empty[Double]
    // warm both
    dec().count(); cents().count()
    for (r <- 1 to 7) {
      if (r % 2 == 1) { td ::= time(() => dec().count()); tc ::= time(() => cents().count()) }
      else { tc ::= time(() => cents().count()); td ::= time(() => dec().count()) }
    }
    println(f"decimal min=${td.min}%.3f med=${td.sorted.apply(3)}%.3f   cents min=${tc.min}%.3f med=${tc.sorted.apply(3)}%.3f")
    spark.stop()
  }
}
