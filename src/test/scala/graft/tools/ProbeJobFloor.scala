package graft.tools

import org.apache.spark.sql.SparkSession

/** Why is a trivial job >100 ms at local[32]? Decompose: pure-RDD job
  * latency, SQL job latency with/without AQE, partition-count scaling,
  * result-fetch. */
object ProbeJobFloor {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sc = spark.sparkContext
    def bench(label: String, n: Int)(f: => Unit): Unit = {
      f
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
      println(f"$label%-52s min ${ts.min}%8.2f ms  med ${ts.sorted.apply(n / 2)}%8.2f ms")
    }
    bench("rdd parallelize(1 elem, 1 part).count", 30) { sc.parallelize(Seq(1), 1).count() }
    bench("rdd parallelize(32 elems, 32 part).count", 30) { sc.parallelize(1 to 32, 32).count() }
    bench("rdd parallelize(256 part).count", 30) { sc.parallelize(1 to 256, 256).count() }
    bench("sql range(1,2,1,1).count  [1 slice]", 30) { spark.range(1, 2, 1, 1).count() }
    bench("sql range(1).count [32 slices]", 30) { spark.range(1).count() }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    bench("sql range(1).count AQE OFF", 30) { spark.range(1).count() }
    bench("sql range(1,2,1,1).count AQE OFF", 30) { spark.range(1, 2, 1, 1).count() }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    val li = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1") + "/lineitem.parquet"
    val schema = spark.read.parquet(li).schema
    import org.apache.spark.sql.functions._
    bench("lineitem 1-exchange agg AQE ON", 10) {
      spark.read.schema(schema).parquet(li).groupBy(col("l_returnflag")).count().collect()
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    bench("lineitem 1-exchange agg AQE OFF", 10) {
      spark.read.schema(schema).parquet(li).groupBy(col("l_returnflag")).count().collect()
    }
    spark.stop()
  }
}
