package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.catalog.LakehouseTable

/** LIMIT pushdown: recorded per-file row counts let a filterless
  * `LIMIT n` open only the files needed to cover n rows. */
class LimitPushdownSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def scannedFiles(): (Int, Int) = LakehouseTable.lastScanFileCounts.get()

  test("LIMIT n scans only enough files to cover n rows") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.limitpd")
    spark.sql("DROP TABLE IF EXISTS lakehouse.limitpd.t")
    spark.sql("CREATE TABLE lakehouse.limitpd.t (k BIGINT, v STRING)")
    // 4 commits → at least 4 files, 100 rows each
    (0 until 4).foreach { c =>
      (0 until 100).map(i => (c * 100L + i, s"v$i")).toDF("k", "v")
        .coalesce(1).createOrReplaceTempView("limitpd_src")
      spark.sql("INSERT INTO lakehouse.limitpd.t SELECT * FROM limitpd_src")
    }

    val rows = spark.sql("SELECT * FROM lakehouse.limitpd.t LIMIT 10").collect()
    rows.length shouldBe 10
    val (survivors, total) = scannedFiles()
    total shouldBe 4
    survivors shouldBe 1 // 100 recorded rows in the first file cover LIMIT 10

    // limit spanning multiple files keeps exactly enough
    spark.sql("SELECT * FROM lakehouse.limitpd.t LIMIT 250").collect().length shouldBe 250
    scannedFiles()._1 shouldBe 3

    // limit beyond the table keeps everything and returns all rows
    spark.sql("SELECT * FROM lakehouse.limitpd.t LIMIT 5000").collect().length shouldBe 400
    scannedFiles()._1 shouldBe 4
  }

  test("a partially-matching filter disables truncation and results stay complete") {
    // k >= 350 straddles the last file: the filter stays residual, so
    // recorded counts no longer bound matching rows and nothing truncates
    val rows = spark.sql(
      "SELECT * FROM lakehouse.limitpd.t WHERE k >= 350 LIMIT 40").collect()
    rows.length shouldBe 40
    rows.map(_.getLong(0)).foreach(_ should be >= 350L)
  }

  test("an exactly-accepted filter composes with limit truncation") {
    // k >= 100: file 1 provably misses (pruned), files 2-4 provably
    // fully match (accepted) → survivors hold only matching rows, so
    // the recorded counts still bound the limit and one file suffices
    val rows = spark.sql(
      "SELECT * FROM lakehouse.limitpd.t WHERE k >= 100 LIMIT 50").collect()
    rows.length shouldBe 50
    rows.map(_.getLong(0)).foreach(_ should be >= 100L)
    val (survivors, total) = scannedFiles()
    total shouldBe 4
    survivors shouldBe 1
  }
}
