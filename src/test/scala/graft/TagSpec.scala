package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.catalog.Maintenance

/** Snapshot tags: named time travel plus retention protection — a
  * tagged snapshot survives expire_snapshots and vacuum intact. */
class TagSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tags name snapshots, protect them from retention, and drop cleanly") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.tags")
    spark.sql("DROP TABLE IF EXISTS lakehouse.tags.t")
    spark.sql("CREATE TABLE lakehouse.tags.t (k BIGINT)") // v1
    (1L to 5L).toDF("k").createOrReplaceTempView("tags_src1")
    spark.sql("INSERT INTO lakehouse.tags.t SELECT * FROM tags_src1") // v2
    (6L to 9L).toDF("k").createOrReplaceTempView("tags_src2")
    spark.sql("INSERT INTO lakehouse.tags.t SELECT * FROM tags_src2") // v3

    spark.sql("CALL lakehouse.system.tag('tags', 't', 'training-set', 2)") // v4
    // name resolution in SQL time travel
    spark.sql("SELECT * FROM lakehouse.tags.t VERSION AS OF 'training-set'")
      .collect().map(_.getLong(0)).sorted.toSeq shouldBe (1L to 5L)

    // overwrite drops v2's files from the current snapshot...
    spark.sql("INSERT OVERWRITE lakehouse.tags.t SELECT * FROM tags_src2") // v5
    // ...but expire + vacuum must keep the tagged snapshot whole
    spark.sql("CALL lakehouse.system.expire_snapshots('tags', 't', 1)")
    Maintenance.vacuum(spark, "lakehouse", Seq("tags"), "t",
      retainVersions = 1, retentionMs = 0L)
    spark.sql("SELECT * FROM lakehouse.tags.t VERSION AS OF 'training-set'")
      .collect().map(_.getLong(0)).sorted.toSeq shouldBe (1L to 5L)
    // current state unaffected
    spark.table("lakehouse.tags.t").collect().map(_.getLong(0)).sorted
      .toSeq shouldBe (6L to 9L)

    // dropped tag: the name stops resolving and the version expires
    spark.sql("CALL lakehouse.system.drop_tag('tags', 't', 'training-set')")
    an[Exception] should be thrownBy
      spark.sql("SELECT * FROM lakehouse.tags.t VERSION AS OF 'training-set'").collect()
    spark.sql("CALL lakehouse.system.expire_snapshots('tags', 't', 1)")
    an[Exception] should be thrownBy
      spark.sql("SELECT * FROM lakehouse.tags.t VERSION AS OF 2").collect()
  }

  test("refs metadata table lists the head and every tag") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.tags")
    spark.sql("DROP TABLE IF EXISTS lakehouse.tags.r")
    spark.sql("CREATE TABLE lakehouse.tags.r (k BIGINT)") // v1
    (1L to 3L).toDF("k").createOrReplaceTempView("tags_rsrc")
    spark.sql("INSERT INTO lakehouse.tags.r SELECT * FROM tags_rsrc") // v2
    spark.sql("CALL lakehouse.system.tag('tags', 'r', 'gold', 2)") // v3
    spark.sql("CALL lakehouse.system.tag('tags', 'r', 'baseline', 1)") // v4

    val refs = spark.sql("SELECT * FROM lakehouse.tags.r.refs ORDER BY type, name")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    refs shouldBe Array(
      ("main", "head", 4), ("baseline", "tag", 1), ("gold", "tag", 2))

    spark.sql("CALL lakehouse.system.drop_tag('tags', 'r', 'baseline')")
    spark.sql("SELECT * FROM lakehouse.tags.r.refs WHERE type = 'tag'")
      .collect().map(_.getString(0)) shouldBe Array("gold")
    spark.sql("DROP TABLE lakehouse.tags.r")
  }

  test("tagging a missing or expired version fails clearly") {
    val e = intercept[IllegalArgumentException] {
      Maintenance.tag(spark, "lakehouse", Seq("tags"), "t", "nope", 999)
    }
    e.getMessage should include("metadata missing")
  }
}
