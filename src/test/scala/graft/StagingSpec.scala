package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Atomic CTAS / REPLACE TABLE AS SELECT through StagingTableCatalog. */
class StagingSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("CTAS creates and fills the table in one visible step") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.stage_ns")
    spark.sql("DROP TABLE IF EXISTS lakehouse.stage_ns.c1")
    Seq((1, "a"), (2, "b")).toDF("k", "v").createOrReplaceTempView("c1_src")
    spark.sql("CREATE TABLE lakehouse.stage_ns.c1 AS SELECT * FROM c1_src")
    spark.table("lakehouse.stage_ns.c1").orderBy($"k")
      .as[(Int, String)].collect().toSeq shouldBe Seq((1, "a"), (2, "b"))
    // one commit: create-with-data, not create-then-append
    spark.sql("SELECT operation FROM lakehouse.stage_ns.c1.history")
      .collect().map(_.getString(0)).toSeq shouldBe Seq("create")
    spark.sql("DROP TABLE lakehouse.stage_ns.c1")
  }

  test("failed CTAS leaves no table behind") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.stage_ns")
    spark.sql("DROP TABLE IF EXISTS lakehouse.stage_ns.c2")
    intercept[Exception] {
      // the SELECT fails at execution time (division by zero under ANSI)
      spark.sql("""CREATE TABLE lakehouse.stage_ns.c2 AS
                  |SELECT id, 1/(id - 5) AS bad FROM RANGE(10)""".stripMargin)
    }
    spark.catalog.tableExists("lakehouse.stage_ns.c2") shouldBe false
    spark.sql("SHOW TABLES IN lakehouse.stage_ns")
      .collect().map(_.getAs[String]("tableName")) should not contain "c2"
    spark.sql("DROP TABLE IF EXISTS lakehouse.stage_ns.c2")
  }

  test("REPLACE TABLE AS SELECT swaps schema+data atomically, history intact") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.stage_ns")
    spark.sql("DROP TABLE IF EXISTS lakehouse.stage_ns.r1")
    Seq((1, "a")).toDF("k", "v").createOrReplaceTempView("r1_src")
    spark.sql("CREATE TABLE lakehouse.stage_ns.r1 AS SELECT * FROM r1_src")

    Seq((10L, 1.5), (20L, 2.5)).toDF("id", "score").createOrReplaceTempView("r1_new")
    spark.sql("REPLACE TABLE lakehouse.stage_ns.r1 AS SELECT * FROM r1_new")

    // new schema + data
    spark.table("lakehouse.stage_ns.r1").schema.fieldNames.toSeq shouldBe Seq("id", "score")
    spark.table("lakehouse.stage_ns.r1").count() shouldBe 2
    // old version still time-travelable
    spark.sql("SELECT * FROM lakehouse.stage_ns.r1 VERSION AS OF 1")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq shouldBe Seq((1, "a"))
    spark.sql("SELECT operation FROM lakehouse.stage_ns.r1.history ORDER BY version")
      .collect().map(_.getString(0)).toSeq shouldBe Seq("create", "replace")
    spark.sql("DROP TABLE lakehouse.stage_ns.r1")
  }

  test("failed RTAS leaves the old table version current") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.stage_ns")
    spark.sql("DROP TABLE IF EXISTS lakehouse.stage_ns.r2")
    Seq((1, "keep")).toDF("k", "v").createOrReplaceTempView("r2_src")
    spark.sql("CREATE TABLE lakehouse.stage_ns.r2 AS SELECT * FROM r2_src")
    intercept[Exception] {
      spark.sql("""REPLACE TABLE lakehouse.stage_ns.r2 AS
                  |SELECT id, 1/(id - 5) AS bad FROM RANGE(10)""".stripMargin)
    }
    spark.table("lakehouse.stage_ns.r2").as[(Int, String)].collect().toSeq shouldBe
      Seq((1, "keep"))
    spark.sql("DROP TABLE lakehouse.stage_ns.r2")
  }
}
