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

  test("a ref older than its max age is dropped by expire and its versions reclaimed; a fresh ref still pins") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.tags")
    spark.sql("DROP TABLE IF EXISTS lakehouse.tags.age")
    spark.sql("CREATE TABLE lakehouse.tags.age (k BIGINT)") // v1
    (1 to 4).foreach { i =>
      Seq(i.toLong).toDF("k").createOrReplaceTempView("tags_agesrc")
      spark.sql("INSERT INTO lakehouse.tags.age SELECT * FROM tags_agesrc") // v2..v5
    }
    // the forgotten tag: on a streaming table this pins unbounded
    // history forever without per-ref retention
    spark.sql("CALL lakehouse.system.tag('tags', 'age', 'forgotten', 2, 1)") // 1 ms
    spark.sql("CALL lakehouse.system.tag('tags', 'age', 'keeper', 3, 3600000)")
    val forkV = spark.sql(
      "CALL lakehouse.system.branch('tags', 'age', 'oldbr', 1)")
      .collect()(0).getLong(0).toInt
    Thread.sleep(10)
    spark.sql("CALL lakehouse.system.expire_snapshots('tags', 'age', 1)")
    // the aged-out tag is GONE and its pinned version reclaimed
    spark.sql("SELECT name FROM lakehouse.tags.age.refs WHERE type = 'tag'")
      .collect().map(_.getString(0)).toSeq shouldBe Seq("keeper")
    an[Exception] should be thrownBy
      spark.sql("SELECT * FROM lakehouse.tags.age VERSION AS OF 2").collect()
    // the aged-out branch released its fork pin and lost its log dir
    an[Exception] should be thrownBy
      spark.sql(s"SELECT * FROM lakehouse.tags.age VERSION AS OF $forkV").collect()
    java.nio.file.Files.isDirectory(java.nio.file.Paths.get(
      TestSpark.warehouse, "tags", "age", "metadata", "branches", "oldbr")) shouldBe false
    // the fresh tag still pins its version through the same expire
    spark.sql("SELECT * FROM lakehouse.tags.age VERSION AS OF 'keeper'")
      .collect().map(_.getLong(0)).sorted.toSeq shouldBe Seq(1L, 2L)
    spark.sql("DROP TABLE lakehouse.tags.age")
  }

  test("min-versions-to-keep floors a sloppier expire invocation") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.tags")
    spark.sql("DROP TABLE IF EXISTS lakehouse.tags.floor")
    spark.sql("CREATE TABLE lakehouse.tags.floor (k BIGINT) " +
      "TBLPROPERTIES ('graft.expire.min-versions-to-keep'='4')") // v1
    (1 to 5).foreach { i =>
      Seq(i.toLong).toDF("k").createOrReplaceTempView("tags_floorsrc")
      spark.sql("INSERT INTO lakehouse.tags.floor SELECT * FROM tags_floorsrc") // v2..v6
    }
    // the job asks to retain 1; the table owner's property says 4
    spark.sql("CALL lakehouse.system.expire_snapshots('tags', 'floor', 1)")
    // head is v6: v3..v6 must survive, v2 must not
    spark.sql("SELECT * FROM lakehouse.tags.floor VERSION AS OF 3").collect()
      .map(_.getLong(0)).sorted.toSeq shouldBe Seq(1L, 2L)
    an[Exception] should be thrownBy
      spark.sql("SELECT * FROM lakehouse.tags.floor VERSION AS OF 2").collect()
    spark.sql("DROP TABLE lakehouse.tags.floor")
  }
}
