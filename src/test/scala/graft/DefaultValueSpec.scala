package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Column DEFAULT values (Iceberg v3 initial/write defaults): CREATE
  * TABLE ... DEFAULT and ALTER TABLE ADD COLUMN ... DEFAULT. The
  * CURRENT_DEFAULT fills INSERTs that omit the column; the
  * EXISTS_DEFAULT backfills files written BEFORE the column existed —
  * metadata-only, at read time, no rewrite.
  */
class DefaultValueSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("CREATE TABLE with DEFAULT fills omitted INSERT columns") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.dflt")
    spark.sql(
      "CREATE TABLE lakehouse.dflt.t1 (k INT, v STRING DEFAULT 'none', n INT DEFAULT 7)")
    spark.sql("INSERT INTO lakehouse.dflt.t1 (k) VALUES (1)")
    spark.sql("INSERT INTO lakehouse.dflt.t1 VALUES (2, 'x', 9)")
    spark.sql("INSERT INTO lakehouse.dflt.t1 (k, v) VALUES (3, DEFAULT)")
    val rows = spark.table("lakehouse.dflt.t1").orderBy($"k")
      .as[(Int, String, Int)].collect().toSeq
    rows shouldBe Seq((1, "none", 7), (2, "x", 9), (3, "none", 7))
    spark.sql("DROP TABLE lakehouse.dflt.t1")
  }

  test("ADD COLUMN DEFAULT backfills pre-existing files at read time, no rewrite") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.dflt")
    spark.sql("CREATE TABLE lakehouse.dflt.t2 (k INT)")
    Seq(1, 2).toDF("k").createOrReplaceTempView("dflt_old")
    spark.sql("INSERT INTO lakehouse.dflt.t2 SELECT * FROM dflt_old")
    val filesBefore = spark.sql("SELECT file_path FROM lakehouse.dflt.t2.files")
      .collect().map(_.getString(0)).toSeq

    spark.sql("ALTER TABLE lakehouse.dflt.t2 ADD COLUMN grade STRING DEFAULT 'legacy'")
    // no data file rewritten by the DDL
    spark.sql("SELECT file_path FROM lakehouse.dflt.t2.files")
      .collect().map(_.getString(0)).toSeq shouldBe filesBefore

    // old rows read the initial default, not null
    spark.table("lakehouse.dflt.t2").orderBy($"k")
      .as[(Int, String)].collect().toSeq shouldBe Seq((1, "legacy"), (2, "legacy"))

    // new rows: omitted column gets the current default; explicit value wins
    spark.sql("INSERT INTO lakehouse.dflt.t2 (k) VALUES (3)")
    spark.sql("INSERT INTO lakehouse.dflt.t2 VALUES (4, 'new')")
    spark.table("lakehouse.dflt.t2").orderBy($"k").as[(Int, String)].collect().toSeq shouldBe
      Seq((1, "legacy"), (2, "legacy"), (3, "legacy"), (4, "new"))

    // a filter on the defaulted column prunes/matches correctly across generations
    spark.table("lakehouse.dflt.t2").where($"grade" === "legacy").count() shouldBe 3
    spark.sql("DROP TABLE lakehouse.dflt.t2")
  }

  test("SET DEFAULT changes future INSERTs; the initial default stays frozen") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.dflt")
    spark.sql("CREATE TABLE lakehouse.dflt.t4 (k INT)")
    spark.sql("INSERT INTO lakehouse.dflt.t4 VALUES (1)")
    spark.sql("ALTER TABLE lakehouse.dflt.t4 ADD COLUMN v STRING DEFAULT 'v1'")
    spark.sql("ALTER TABLE lakehouse.dflt.t4 ALTER COLUMN v SET DEFAULT 'v2'")
    spark.sql("INSERT INTO lakehouse.dflt.t4 (k) VALUES (2)")
    // row 1 predates the column: initial default 'v1'; row 2 gets the
    // NEW current default 'v2'
    spark.table("lakehouse.dflt.t4").orderBy($"k").as[(Int, String)].collect().toSeq shouldBe
      Seq((1, "v1"), (2, "v2"))
    spark.sql("DROP TABLE lakehouse.dflt.t4")
  }

  test("explicit NULL remains NULL — default only fills ABSENT values") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.dflt")
    spark.sql("CREATE TABLE lakehouse.dflt.t3 (k INT, v STRING DEFAULT 'd')")
    spark.sql("INSERT INTO lakehouse.dflt.t3 VALUES (1, NULL)")
    spark.table("lakehouse.dflt.t3").collect().head.isNullAt(1) shouldBe true
    spark.sql("DROP TABLE lakehouse.dflt.t3")
  }
}
