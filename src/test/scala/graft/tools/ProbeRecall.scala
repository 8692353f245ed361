package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: recall_ok flags of the ANN queries across scale factors. */
object ProbeRecall {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1");
         q <- Seq("q29c_ann_lsh", "q29e_ann_ivf", "q29f_ann_pq")) {
      val df = graft.SparkEntry.queries(q)(spark, s"/root/testdata/$sf")
      val flags = df.select("recall_ok").distinct().collect().map(_.getBoolean(0)).toSeq
      println(s"PROBE $sf $q recall_ok=${flags.mkString(",")}")
    }
    spark.stop()
  }
}
