package graft.tools

import org.apache.spark.sql.SparkSession

/** Micro-costs of the building blocks every bench query pays:
  * warm spark.read.parquet (listing + footer schema inference) vs
  * schema-supplied read, trivial-job round trip, one-exchange agg,
  * and per-operator analysis cost of a growing chain. */
object ProbeMicro {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    def bench(label: String, n: Int)(f: => Unit): Unit = {
      f // warm
      val times = (1 to n).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
      println(f"$label%-46s min ${times.min}%8.2f ms  med ${times.sorted.apply(n / 2)}%8.2f ms")
    }
    val li = s"$sfDir/lineitem.parquet"
    val schema = spark.read.parquet(li).schema
    bench("read.parquet(lineitem) [infer]", 20) { spark.read.parquet(li) }
    bench("read.schema(s).parquet(lineitem)", 20) { spark.read.schema(schema).parquet(li) }
    bench("range(1).count  [trivial job]", 20) { spark.range(1).count() }
    bench("lineitem scan count [no exchange]", 10) { spark.read.schema(schema).parquet(li).count() }
    bench("groupBy(retflag).count.collect [1 exchange]", 10) {
      spark.read.schema(schema).parquet(li)
        .groupBy(col("l_returnflag")).count().collect()
    }
    val df0 = spark.read.schema(schema).parquet(li)
    bench("30 chained withColumn [analysis growth]", 10) {
      (1 to 30).foldLeft(df0)((df, i) => df.withColumn(s"c$i", col("l_quantity") + i))
    }
    bench("1 select of 30 exprs", 10) {
      df0.select(col("*") +: (1 to 30).map(i => (col("l_quantity") + i).as(s"c$i")): _*)
    }
    bench("conf.set excludedRules [Tables.table overhead]", 20) {
      spark.conf.set("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
    }
    // the 5-table join build chain, as q04 does it
    bench("q04 build only", 10) { graft.queries.Relational.q04.run(spark, sfDir) }
    spark.stop()
  }
}
