package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.catalog.{LakehouseTable, Maintenance}

/** Declared write sort order (`graft.write.sort-order`, the Iceberg
  * WRITE ORDERED BY analogue): INSERTs range-cluster by the declared
  * columns so footer ranges prune a plain table like partitions would,
  * and compaction re-establishes the layout. */
class SortOrderSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("plain table: shuffled insert range-clusters, key filter prunes files") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.so_ns")
    spark.sql(
      "CREATE TABLE lakehouse.so_ns.m (k BIGINT, v STRING) " +
        "TBLPROPERTIES ('graft.write.sort-order' = 'k')")
    // worst-case input: keys arrive fully shuffled — without the
    // declared order every file would span the whole key range and a
    // range predicate could prune nothing
    val r = new scala.util.Random(7)
    r.shuffle((0 until 2000).toList).map(i => (i.toLong, s"v$i"))
      .toDF("k", "v").createOrReplaceTempView("so_src")
    spark.sql("INSERT INTO lakehouse.so_ns.m SELECT * FROM so_src")

    val total = spark.sql("SELECT COUNT(*) FROM lakehouse.so_ns.m.files")
      .collect()(0).getLong(0).toInt
    total should be >= 2

    spark.table("lakehouse.so_ns.m").filter($"k" >= 100L && $"k" < 150L)
      .count() shouldBe 50
    val (survivors, all) = LakehouseTable.lastScanFileCounts.get()
    all shouldBe total
    survivors should be < total
    spark.sql("DROP TABLE lakehouse.so_ns.m")
  }

  test("compaction re-establishes the declared order across commits") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.so_ns")
    spark.sql(
      "CREATE TABLE lakehouse.so_ns.c (k BIGINT, v STRING) " +
        "TBLPROPERTIES ('graft.write.sort-order' = 'k')")
    // three commits over the SAME key range: per-commit clustering
    // leaves every key interval covered by ~3 files (one per commit)
    (0 until 3).foreach { c =>
      (0 until 300).map(i => (i.toLong, s"c$c-$i")).toDF("k", "v")
        .createOrReplaceTempView("so_src_c")
      spark.sql("INSERT INTO lakehouse.so_ns.c SELECT * FROM so_src_c")
    }
    Maintenance.compact(spark, "lakehouse", Seq("so_ns"), "c", targetFiles = 4)
    val total = spark.sql("SELECT COUNT(*) FROM lakehouse.so_ns.c.files")
      .collect()(0).getLong(0).toInt
    total shouldBe 4
    spark.table("lakehouse.so_ns.c").count() shouldBe 900

    // post-compaction files cover DISJOINT key intervals again: a
    // narrow range lives in exactly one file
    spark.table("lakehouse.so_ns.c").filter($"k" === 42L).count() shouldBe 3
    val (survivors, all) = LakehouseTable.lastScanFileCounts.get()
    all shouldBe total
    survivors shouldBe 1
    spark.sql("DROP TABLE lakehouse.so_ns.c")
  }

  test("partitioned table: declared order refines the within-partition sort") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.so_ns")
    spark.sql(
      "CREATE TABLE lakehouse.so_ns.p (k BIGINT, region STRING, v STRING) " +
        "PARTITIONED BY (region) " +
        "TBLPROPERTIES ('graft.write.sort-order' = 'k')")
    val r = new scala.util.Random(11)
    r.shuffle((0 until 1000).toList)
      .map(i => (i.toLong, s"r${i % 2}", s"v$i"))
      .toDF("k", "region", "v").createOrReplaceTempView("so_src_p")
    spark.sql("INSERT INTO lakehouse.so_ns.p SELECT * FROM so_src_p")

    // rows land partition-clustered AND k-sorted within each file, so
    // the footer k-ranges are tight: a k-range predicate prunes within
    // the partition's files via row-group/footer stats
    val out = spark.table("lakehouse.so_ns.p")
      .filter($"region" === "r1" && $"k" < 10L)
    out.count() shouldBe 5
    spark.sql("DROP TABLE lakehouse.so_ns.p")
  }

  test("unknown sort column fails at CREATE and at ALTER, not first write") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.so_ns")
    val e1 = intercept[Exception] {
      spark.sql(
        "CREATE TABLE lakehouse.so_ns.bad (k BIGINT) " +
          "TBLPROPERTIES ('graft.write.sort-order' = 'nope')")
    }
    e1.getMessage should include("no such column")

    spark.sql("CREATE TABLE lakehouse.so_ns.ok (k BIGINT, v STRING)")
    val e2 = intercept[Exception] {
      spark.sql(
        "ALTER TABLE lakehouse.so_ns.ok SET TBLPROPERTIES " +
          "('graft.write.sort-order' = 'v, gone')")
    }
    e2.getMessage should include("no such column")
    // declaring a valid order later applies to future writes only
    spark.sql(
      "ALTER TABLE lakehouse.so_ns.ok SET TBLPROPERTIES " +
        "('graft.write.sort-order' = 'k')")
    spark.sql("DROP TABLE lakehouse.so_ns.ok")
  }
}
