package graft

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.catalog.{ColumnRange, FileSkipping, LakehouseTable}

class FileSkippingSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", IntegerType), StructField("s", StringType)))
  private val stats = Map(
    "f1" -> Map("k" -> ColumnRange("0", "4"), "s" -> ColumnRange("a", "m")),
    "f2" -> Map("k" -> ColumnRange("5", "9"), "s" -> ColumnRange("n", "z")),
    "f3" -> Map.empty[String, ColumnRange]) // no stats → never skipped
  private val files = Seq("f1", "f2", "f3")

  test("pruning proves absence, keeps uncertainty") {
    def prune(f: Filter*) = FileSkipping.prune(files, stats, schema, f)
    prune(EqualTo("k", 3)) shouldBe Seq("f1", "f3")
    prune(EqualTo("k", 7)) shouldBe Seq("f2", "f3")
    prune(GreaterThan("k", 4)) shouldBe Seq("f2", "f3")
    prune(LessThanOrEqual("k", 4)) shouldBe Seq("f1", "f3")
    prune(In("k", Array(1, 2))) shouldBe Seq("f1", "f3")
    prune(EqualTo("s", "q")) shouldBe Seq("f2", "f3")
    prune(And(EqualTo("k", 3), EqualTo("s", "q"))) shouldBe Seq("f3")
    prune(Or(EqualTo("k", 3), EqualTo("s", "q"))) shouldBe files
    // unknown filter shapes never skip
    prune(StringContains("s", "x")) shouldBe files
    prune(Not(EqualTo("k", 3))) shouldBe files
    // boundary values stay inclusive
    prune(EqualTo("k", 4)) shouldBe Seq("f1", "f3")
    prune(GreaterThanOrEqual("k", 9)) shouldBe Seq("f2", "f3")
  }

  test("clustered partitioned table skips whole files on key predicates") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.skip_ns")
    spark.sql("""CREATE TABLE lakehouse.skip_ns.clustered (k INT, v STRING)
      PARTITIONED BY (k)""")
    // four commits, each a disjoint key range → four files with disjoint
    // k-stats (AQE correctly coalesces each small commit to one file)
    (0 until 4).foreach { c =>
      (0 until 2500).map(i => (c * 5 + i % 5, s"v$i")).toDF("k", "v")
        .createOrReplaceTempView("skip_src")
      spark.sql("INSERT INTO lakehouse.skip_ns.clustered SELECT * FROM skip_src")
    }

    val all = spark.table("lakehouse.skip_ns.clustered")
    all.count() shouldBe 10000
    val totalFiles = LakehouseTable.lastScanFileCounts.get()._2
    totalFiles should be > 1

    val filtered = all.where($"k" === 3)
    filtered.count() shouldBe 500
    val (survivors, total) = LakehouseTable.lastScanFileCounts.get()
    total shouldBe totalFiles
    survivors should be < total // whole files eliminated from metadata

    // range predicate too
    all.where($"k" >= 18).count() shouldBe 1000
    LakehouseTable.lastScanFileCounts.get()._1 should be < total

    // and correctness: skipping returns the same rows as a full scan
    val viaFull = (0 until 10000).count(_ % 20 == 3)
    filtered.count().toInt shouldBe viaFull
    spark.sql("DROP TABLE lakehouse.skip_ns.clustered")
  }

  test("timestamp stats round-trip through skipping") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.skip_ns")
    spark.sql("""CREATE TABLE lakehouse.skip_ns.ts_t (ts TIMESTAMP, v INT)
      PARTITIONED BY (ts)""")
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // two commits with disjoint time ranges → two files, provably skippable
    (0 until 2).foreach { c =>
      (0 until 500).map(i =>
          (new java.sql.Timestamp(base.getTime + (c * 500 + i) * 3600L * 1000), i))
        .toDF("ts", "v").createOrReplaceTempView("ts_src")
      spark.sql("INSERT INTO lakehouse.skip_ns.ts_t SELECT * FROM ts_src")
    }
    val cnt = spark.table("lakehouse.skip_ns.ts_t")
      .where($"ts" >= java.sql.Timestamp.valueOf("2024-02-01 00:00:00")).count()
    cnt shouldBe 1000 - 31 * 24
    val (survivors, total) = LakehouseTable.lastScanFileCounts.get()
    total shouldBe 2
    survivors shouldBe 1 // the first month's file is eliminated by stats
    spark.sql("DROP TABLE lakehouse.skip_ns.ts_t")
  }
}
