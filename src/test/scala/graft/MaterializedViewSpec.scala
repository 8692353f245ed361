package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.catalog.MaterializedView
import graft.catalog.MaterializedView.Agg

/** Incremental materialized-view maintenance: appends fold in via the
  * version-window delta; row-level DML falls back to a full rebuild;
  * either way the MV equals the direct aggregate of the source. */
class MaterializedViewSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val aggs = Seq(
    Agg("sum", "amount", "total"),
    Agg("count", "*", "n"),
    Agg("min", "amount", "lo"),
    Agg("max", "amount", "hi"))

  private def direct(): Array[(String, Long, Long, Long, Long)] =
    spark.sql(
      """SELECT cat, SUM(amount) AS total, COUNT(*) AS n,
        |       MIN(amount) AS lo, MAX(amount) AS hi
        |FROM lakehouse.mv_ns.fact GROUP BY cat ORDER BY cat""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  private def mvRows(): Array[(String, Long, Long, Long, Long)] =
    spark.sql("SELECT * FROM lakehouse.mv_ns.fact_by_cat ORDER BY cat")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  test("create, incremental refresh on append, full fallback on delete, noop when current") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.mv_ns")
    spark.sql("CREATE TABLE lakehouse.mv_ns.fact (cat STRING, amount BIGINT)")
    Seq(("a", 10L), ("a", 5L), ("b", 7L)).toDF("cat", "amount")
      .createOrReplaceTempView("mv_src")
    spark.sql("INSERT INTO lakehouse.mv_ns.fact SELECT * FROM mv_src")

    MaterializedView.create(spark, "lakehouse", Seq("mv_ns"), "fact_by_cat",
      "fact", Seq("cat"), aggs)
    mvRows() shouldBe direct()

    // already current → noop
    MaterializedView.refresh(spark, "lakehouse", Seq("mv_ns"), "fact_by_cat") shouldBe "noop"

    // appends (one new group, one existing) fold in incrementally
    Seq(("b", 100L), ("c", 1L)).toDF("cat", "amount").createOrReplaceTempView("mv_src2")
    spark.sql("INSERT INTO lakehouse.mv_ns.fact SELECT * FROM mv_src2")
    Seq(("a", 2L)).toDF("cat", "amount").createOrReplaceTempView("mv_src3")
    spark.sql("INSERT INTO lakehouse.mv_ns.fact SELECT * FROM mv_src3")
    MaterializedView.refresh(
      spark, "lakehouse", Seq("mv_ns"), "fact_by_cat") shouldBe "incremental"
    mvRows() shouldBe direct()

    // row-level delete: deltas can't represent removals → full rebuild
    spark.sql("DELETE FROM lakehouse.mv_ns.fact WHERE amount = 100")
    MaterializedView.refresh(
      spark, "lakehouse", Seq("mv_ns"), "fact_by_cat") shouldBe "full"
    mvRows() shouldBe direct()

    // the SQL surface: append then CALL refresh_mv
    Seq(("d", 50L)).toDF("cat", "amount").createOrReplaceTempView("mv_src4")
    spark.sql("INSERT INTO lakehouse.mv_ns.fact SELECT * FROM mv_src4")
    spark.sql("CALL lakehouse.system.refresh_mv('mv_ns', 'fact_by_cat')")
      .collect()(0).getString(0) shouldBe "incremental"
    mvRows() shouldBe direct()

    // the MV is an ordinary table: time travel sees the pre-refresh state
    val versions = spark.sql(
      "SELECT version FROM lakehouse.mv_ns.fact_by_cat.history ORDER BY version")
      .collect().map(_.getInt(0))
    versions.length should be >= 2

    spark.sql("DROP TABLE lakehouse.mv_ns.fact_by_cat")
    spark.sql("DROP TABLE lakehouse.mv_ns.fact")
  }

  test("retractable MV folds row-level deletes incrementally via the changelog") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.mv_ns")
    spark.sql("CREATE TABLE lakehouse.mv_ns.fact2 (cat STRING, amount BIGINT)")
    Seq(("a", 10L), ("a", 5L), ("b", 7L), ("c", 3L)).toDF("cat", "amount")
      .createOrReplaceTempView("mvr_src")
    spark.sql("INSERT INTO lakehouse.mv_ns.fact2 SELECT * FROM mvr_src")
    // sum + count(*) only → every aggregate retractable
    MaterializedView.create(spark, "lakehouse", Seq("mv_ns"), "fact2_by_cat",
      "fact2", Seq("cat"), Seq(Agg("sum", "amount", "total"), Agg("count", "*", "n")))

    def direct2() = spark.sql(
      """SELECT cat, SUM(amount) AS total, COUNT(*) AS n
        |FROM lakehouse.mv_ns.fact2 GROUP BY cat ORDER BY cat""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def mv2() = spark.sql("SELECT * FROM lakehouse.mv_ns.fact2_by_cat ORDER BY cat")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    // COW row-level delete: the changelog's ± rows fold as a net delta
    spark.sql("DELETE FROM lakehouse.mv_ns.fact2 WHERE amount = 5")
    MaterializedView.refresh(
      spark, "lakehouse", Seq("mv_ns"), "fact2_by_cat") shouldBe "incremental-retract"
    mv2() shouldBe direct2()

    // a group deleted in FULL disappears from the MV (count gate)
    spark.sql("DELETE FROM lakehouse.mv_ns.fact2 WHERE cat = 'c'")
    MaterializedView.refresh(
      spark, "lakehouse", Seq("mv_ns"), "fact2_by_cat") shouldBe "incremental-retract"
    mv2() shouldBe direct2()
    mv2().map(_._1) should not contain "c"

    // merge-on-read equality delete + an append in the same window
    graft.catalog.MergeOnRead.morDelete(
      spark, "lakehouse", Seq("mv_ns"), "fact2", Seq(7L).toDF("amount"))
    Seq(("b", 20L), ("d", 1L)).toDF("cat", "amount").createOrReplaceTempView("mvr_src2")
    spark.sql("INSERT INTO lakehouse.mv_ns.fact2 SELECT * FROM mvr_src2")
    MaterializedView.refresh(
      spark, "lakehouse", Seq("mv_ns"), "fact2_by_cat") shouldBe "incremental-retract"
    mv2() shouldBe direct2()

    spark.sql("DROP TABLE lakehouse.mv_ns.fact2_by_cat")
    spark.sql("DROP TABLE lakehouse.mv_ns.fact2")
  }

  test("global (ungrouped) materialized aggregate") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.mv_ns")
    spark.sql("CREATE TABLE lakehouse.mv_ns.g (amount BIGINT)")
    Seq(1L, 2L, 3L).toDF("amount").createOrReplaceTempView("g_src")
    spark.sql("INSERT INTO lakehouse.mv_ns.g SELECT * FROM g_src")
    MaterializedView.create(spark, "lakehouse", Seq("mv_ns"), "g_total",
      "g", Nil, Seq(Agg("sum", "amount", "total"), Agg("count", "*", "n")))
    spark.table("lakehouse.mv_ns.g_total").collect()
      .map(r => (r.getLong(0), r.getLong(1))) shouldBe Array((6L, 3L))
    Seq(10L).toDF("amount").createOrReplaceTempView("g_src2")
    spark.sql("INSERT INTO lakehouse.mv_ns.g SELECT * FROM g_src2")
    MaterializedView.refresh(spark, "lakehouse", Seq("mv_ns"), "g_total") shouldBe "incremental"
    spark.table("lakehouse.mv_ns.g_total").collect()
      .map(r => (r.getLong(0), r.getLong(1))) shouldBe Array((16L, 4L))
    spark.sql("DROP TABLE lakehouse.mv_ns.g_total")
    spark.sql("DROP TABLE lakehouse.mv_ns.g")
  }
}
