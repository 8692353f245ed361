package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.catalog.Maintenance

/** Dropped-column tombstones: name-based parquet resolution would
  * silently RESURRECT a dropped column's old values if the name were
  * re-added while old files still carry the physical column — the DDL
  * must refuse until a full rewrite clears the data. */
class ColumnTombstoneSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def setup(name: String): Unit = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.tomb")
    spark.sql(s"DROP TABLE IF EXISTS lakehouse.tomb.$name")
    spark.sql(s"CREATE TABLE lakehouse.tomb.$name (k BIGINT, v STRING)")
    Seq((1L, "secret"), (2L, "pii")).toDF("k", "v")
      .createOrReplaceTempView(s"tomb_src_$name")
    spark.sql(s"INSERT INTO lakehouse.tomb.$name SELECT * FROM tomb_src_$name")
  }

  test("re-adding a dropped column name is refused while old data survives") {
    setup("t")
    spark.sql("ALTER TABLE lakehouse.tomb.t DROP COLUMN v")
    spark.table("lakehouse.tomb.t").columns.toSeq shouldBe Seq("k")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE lakehouse.tomb.t ADD COLUMN v STRING")
    }
    e.getMessage should include("resurrect")
    // a DIFFERENT name is fine, and reads back null for old rows
    spark.sql("ALTER TABLE lakehouse.tomb.t ADD COLUMN w STRING")
    spark.table("lakehouse.tomb.t").collect().foreach(_.isNullAt(1) shouldBe true)
  }

  test("compact rewrites the files and clears the tombstone") {
    setup("t2")
    spark.sql("ALTER TABLE lakehouse.tomb.t2 DROP COLUMN v")
    Maintenance.compact(spark, "lakehouse", Seq("tomb"), "t2", targetFiles = 1)
    spark.sql("ALTER TABLE lakehouse.tomb.t2 ADD COLUMN v STRING")
    val rows = spark.table("lakehouse.tomb.t2").collect()
    rows.length shouldBe 2
    rows.foreach(_.isNullAt(1) shouldBe true) // no resurrected secrets
  }

  test("INSERT OVERWRITE clears the tombstone too") {
    setup("t3")
    spark.sql("ALTER TABLE lakehouse.tomb.t3 DROP COLUMN v")
    spark.sql("INSERT OVERWRITE lakehouse.tomb.t3 SELECT 9")
    spark.sql("ALTER TABLE lakehouse.tomb.t3 ADD COLUMN v STRING")
    val rows = spark.table("lakehouse.tomb.t3").collect()
    rows.map(_.getLong(0)).toSeq shouldBe Seq(9L)
    rows.foreach(_.isNullAt(1) shouldBe true)
  }

  test("drop on an empty table needs no tombstone") {
    spark.sql("DROP TABLE IF EXISTS lakehouse.tomb.empty")
    spark.sql("CREATE TABLE lakehouse.tomb.empty (k BIGINT, v STRING)")
    spark.sql("ALTER TABLE lakehouse.tomb.empty DROP COLUMN v")
    noException should be thrownBy
      spark.sql("ALTER TABLE lakehouse.tomb.empty ADD COLUMN v STRING")
  }
}
