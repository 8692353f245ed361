package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.catalog.{LakehouseTable, Maintenance}

/** Partition evolution: the spec is a write-clustering + pruning
  * contract, so changing it is metadata-only — old files keep their
  * layout, new commits cluster by the new columns, and file skipping
  * serves both generations. */
class PartitionEvolutionSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def scanned(): (Int, Int) = LakehouseTable.lastScanFileCounts.get()

  test("evolving the spec re-clusters new commits; pruning works across generations") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.pevo")
    spark.sql(
      "CREATE TABLE lakehouse.pevo.t (k INT, region STRING, day STRING) " +
        "PARTITIONED BY (region)")
    // generation 1: one commit per region → 2 files clustered by
    // region, each spanning ALL days
    Seq("r0", "r1").zipWithIndex.foreach { case (r, ri) =>
      (0 until 400).filter(_ % 2 == ri)
        .map(i => (i, r, s"day-${('a' + i % 4).toChar}"))
        .toDF("k", "region", "day").createOrReplaceTempView("pevo_src")
      spark.sql("INSERT INTO lakehouse.pevo.t SELECT * FROM pevo_src")
    }
    // region filter skips the other region's file
    spark.table("lakehouse.pevo.t").where($"region" === "r0").count() shouldBe 200
    val (rSurv, rTotal) = scanned()
    rSurv shouldBe 1
    rTotal shouldBe 2

    // evolve: the table outgrew region granularity — cluster future
    // commits by day instead (no file moves)
    val filesBefore = spark.sql("SELECT file_path FROM lakehouse.pevo.t.files")
      .collect().map(_.getString(0)).toSeq
    spark.sql("CALL lakehouse.system.set_partitioning('pevo', 't', 'day')")
    spark.sql("SELECT file_path FROM lakehouse.pevo.t.files")
      .collect().map(_.getString(0)).toSeq should contain theSameElementsAs filesBefore
    spark.sql("SELECT operation FROM lakehouse.pevo.t.history ORDER BY version")
      .collect().last.getString(0) shouldBe "set-partitioning(day)"

    // generation 2: one commit, clustered by day → one file per day
    // (AQE coalescing off so the clustering is observable at toy size)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      (1000 until 1400).map(i => (i, s"r${i % 2}", s"day-${('a' + i % 4).toChar}"))
        .toDF("k", "region", "day").createOrReplaceTempView("pevo_src2")
      spark.sql("INSERT INTO lakehouse.pevo.t SELECT * FROM pevo_src2")
    } finally spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    val totalFiles = spark.sql("SELECT count(*) FROM lakehouse.pevo.t.files")
      .collect()(0).getLong(0).toInt
    totalFiles should be > 3 // gen2 split by day

    // a day predicate: both gen-1 files survive (they span all days —
    // kept for correctness), but gen-2 files of other days skip
    spark.table("lakehouse.pevo.t").where($"day" === "day-a").count() shouldBe 200
    val (dSurv, dTotal) = scanned()
    dTotal shouldBe totalFiles
    dSurv should be >= 2 // old generation never mis-skipped
    dSurv should be < dTotal // new generation prunes

    // region predicate still prunes the old generation
    spark.table("lakehouse.pevo.t").where($"region" === "r1").count() shouldBe 400

    // compactWhere selects by the NEW partition column
    Maintenance.compactWhere(spark, "lakehouse", Seq("pevo"), "t",
      Map("day" -> "day-a"), targetFiles = 1) should be >= 1
    spark.table("lakehouse.pevo.t").count() shouldBe 800
    spark.sql("DROP TABLE lakehouse.pevo.t")
  }

  test("guard rails: unknown columns and bucketed tables are refused") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.pevo")
    spark.sql("CREATE TABLE lakehouse.pevo.g (k INT, v STRING) PARTITIONED BY (k)")
    val e = intercept[IllegalArgumentException] {
      Maintenance.setPartitioning(spark, "lakehouse", Seq("pevo"), "g", Seq("nope"))
    }
    e.getMessage should include("no such column")
    // un-partitioning is allowed
    Maintenance.setPartitioning(spark, "lakehouse", Seq("pevo"), "g", Nil)
    spark.sql("DROP TABLE lakehouse.pevo.g")

    spark.sql(
      "CREATE TABLE lakehouse.pevo.b (k INT, v STRING) PARTITIONED BY (bucket(4, k))")
    val eb = intercept[IllegalArgumentException] {
      Maintenance.setPartitioning(spark, "lakehouse", Seq("pevo"), "b", Seq("v"))
    }
    eb.getMessage should include("bucket")
    spark.sql("DROP TABLE lakehouse.pevo.b")
  }
}
