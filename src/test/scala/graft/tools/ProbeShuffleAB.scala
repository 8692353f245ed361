package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B the shuffle writer path: default (BypassMergeSortShuffleWriter
  * at ≤200 reduce partitions: one file PER REDUCE PARTITION per map
  * task + an mmap-based concat) vs serialized sort shuffle
  * (bypassMergeThreshold=1: one sorted file per map task, no merge
  * fan-in) vs bypass with streaming copy (file.transferTo=false).
  * Stack sampling showed map tasks burning CPU in
  * FileChannelImpl.map0 under writePartitionedDataWithChannel. */
object ProbeShuffleAB {
  def run(conf: Map[String, String], label: String, queries: Seq[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .config("spark.shuffle.sort.bypassMergeThreshold", "1") // production base (r19)
      .config("spark.ui.enabled", "false")
    conf.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").count()
    }
    def releasePins(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    val selected = graft.SparkEntry.allQueries.filter(q => queries.contains(q.name) ||
      queries.exists(n => q.name.startsWith(n)))
    var total = 0.0
    selected.foreach { q =>
      q.run(spark, sfDir).count(); releasePins()
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        q.run(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        releasePins(); dt
      }.min
      total += t
      println(f"[$label] ${q.name}%-26s $t%7.3f")
    }
    println(f"[$label] TOTAL $total%7.3f")
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val qs = if (args.nonEmpty) args.toSeq
      else Seq("q37", "q28b", "q04", "q92_tpch_q5", "q98", "q64", "q10_hash_agg")
    // interleaved: tmpfs local dir vs default /tmp (ext4 measured 15×
    // slower per file create; FileOutputStream.open0 was 60% of
    // executor samples), plus checksum-off on top
    val shm = "/dev/shm/graft-ab-local"
    run(Map("spark.local.dir" -> shm), "shm-localdir", qs)
    run(Map.empty, "tmp-default", qs)
    run(Map("spark.local.dir" -> shm,
      "spark.shuffle.checksum.enabled" -> "false"), "shm-nochecksum", qs)
    run(Map("spark.local.dir" -> shm), "shm-localdir2", qs)
    run(Map.empty, "tmp-default2", qs)
  }
}
