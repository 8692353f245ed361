package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.catalog.{Maintenance, TableMetadata}

/** changelogBetween: row-level CDC derived from the copy-on-write file
  * diff — appends emit inserts, DELETE emits just the deleted rows,
  * UPDATE emits delete+insert pairs, compaction cancels to nothing. */
class ChangelogSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def changelog(from: Int, to: Int) =
    Maintenance.changelogBetween(spark, "lakehouse", Seq("cdc"), "t", from, to)

  test("changelog reconstructs every commit type from the file diff") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.cdc")
    spark.sql("DROP TABLE IF EXISTS lakehouse.cdc.t")
    spark.sql("CREATE TABLE lakehouse.cdc.t (k BIGINT, v STRING)") // v1
    (1L to 10L).map(k => (k, s"a$k")).toDF("k", "v").coalesce(2)
      .createOrReplaceTempView("cdc_src1")
    spark.sql("INSERT INTO lakehouse.cdc.t SELECT * FROM cdc_src1") // v2
    (11L to 20L).map(k => (k, s"b$k")).toDF("k", "v").coalesce(2)
      .createOrReplaceTempView("cdc_src2")
    spark.sql("INSERT INTO lakehouse.cdc.t SELECT * FROM cdc_src2") // v3
    spark.sql("DELETE FROM lakehouse.cdc.t WHERE k <= 3") // v4
    Maintenance.compact(spark, "lakehouse", Seq("cdc"), "t", targetFiles = 1) // v5
    spark.sql("UPDATE lakehouse.cdc.t SET v = 'updated' WHERE k = 20") // v6

    val cl = changelog(0, 6).collect()
    val byVersion = cl.groupBy(r => (r.getInt(cl.head.length - 1), r.getString(cl.head.length - 2)))
      .view.mapValues(_.length).toMap

    byVersion.getOrElse((2, "insert"), 0) shouldBe 10
    byVersion.getOrElse((3, "insert"), 0) shouldBe 10
    byVersion.getOrElse((4, "delete"), 0) shouldBe 3
    byVersion.getOrElse((4, "insert"), 0) shouldBe 0 // rewritten survivors cancel
    byVersion.keys.map(_._1) should not contain 5 // compaction is row-preserving
    byVersion.getOrElse((6, "delete"), 0) shouldBe 1
    byVersion.getOrElse((6, "insert"), 0) shouldBe 1

    // the update pair carries the pre- and post-image values
    val v6 = cl.filter(_.getInt(3) == 6)
    v6.filter(_.getString(2) == "delete").map(_.getString(1)).toSeq shouldBe Seq("b20")
    v6.filter(_.getString(2) == "insert").map(_.getString(1)).toSeq shouldBe Seq("updated")

    // replaying the changelog onto the v0 empty state yields the table
    val replayed = cl.filter(_.getString(2) == "insert").map(r => (r.getLong(0), r.getString(1)))
      .toSet -- cl.filter(_.getString(2) == "delete").map(r => (r.getLong(0), r.getString(1))).toSet
    val actual = spark.table("lakehouse.cdc.t").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    replayed shouldBe actual
  }

  test("a merge-on-read MERGE's delta commit emits exact +/- changelog rows") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.cdc")
    spark.sql("DROP TABLE IF EXISTS lakehouse.cdc.md")
    spark.sql("""CREATE TABLE lakehouse.cdc.md (k BIGINT, v STRING)
                |TBLPROPERTIES ('write.merge.mode'='merge-on-read')""".stripMargin) // v1
    (1L to 5L).map(k => (k, s"a$k")).toDF("k", "v").createOrReplaceTempView("cdc_md_src")
    spark.sql("INSERT INTO lakehouse.cdc.md SELECT * FROM cdc_md_src") // v2
    Seq((2L, "B2"), (6L, "NEW")).toDF("k", "v").createOrReplaceTempView("cdc_md_chg")
    spark.sql("""MERGE INTO lakehouse.cdc.md t USING cdc_md_chg s ON t.k = s.k
                |WHEN MATCHED THEN UPDATE SET t.v = s.v
                |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)
                |""".stripMargin) // v3: positional delete of (2,a2) + inserts

    val v3 = Maintenance.changelogBetween(
      spark, "lakehouse", Seq("cdc"), "md", 2, 3).collect()
    v3.filter(_.getString(2) == "delete").map(r => (r.getLong(0), r.getString(1)))
      .toSeq shouldBe Seq((2L, "a2"))
    v3.filter(_.getString(2) == "insert").map(r => (r.getLong(0), r.getString(1)))
      .toSeq.sorted shouldBe Seq((2L, "B2"), (6L, "NEW"))
    spark.sql("DROP TABLE lakehouse.cdc.md")
  }

  test("SELECT from t.changes serves the batch changelog; options narrow the window") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.cdc")
    spark.sql("DROP TABLE IF EXISTS lakehouse.cdc.b")
    spark.sql("CREATE TABLE lakehouse.cdc.b (k BIGINT, v STRING)") // v1
    (1L to 5L).map(k => (k, s"a$k")).toDF("k", "v")
      .createOrReplaceTempView("cdc_b1")
    spark.sql("INSERT INTO lakehouse.cdc.b SELECT * FROM cdc_b1") // v2
    spark.sql("DELETE FROM lakehouse.cdc.b WHERE k = 5") // v3

    // SQL face: full retained changelog
    val all = spark.sql(
      "SELECT k, v, _change_type, _commit_version FROM lakehouse.cdc.b.changes").collect()
    all.count(_.getString(2) == "insert") shouldBe 5
    all.count(_.getString(2) == "delete") shouldBe 1
    all.filter(_.getString(2) == "delete").head.getLong(0) shouldBe 5L

    // narrowed window via read options
    val tail = spark.read.option("startingVersion", "2")
      .table("lakehouse.cdc.b.changes").collect()
    tail.map(_.getString(2)).toSeq shouldBe Seq("delete")

    // a later commit is visible to the next batch query (re-staged)
    (6L to 7L).map(k => (k, s"c$k")).toDF("k", "v")
      .createOrReplaceTempView("cdc_b2")
    spark.sql("INSERT INTO lakehouse.cdc.b SELECT * FROM cdc_b2") // v4
    spark.sql("SELECT * FROM lakehouse.cdc.b.changes WHERE _commit_version = 4")
      .count() shouldBe 2
    spark.sql("DROP TABLE lakehouse.cdc.b")
  }

  test("batch .changes spans a schema change under spanSchemaChanges") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.cdc")
    spark.sql("DROP TABLE IF EXISTS lakehouse.cdc.span")
    spark.sql("CREATE TABLE lakehouse.cdc.span (k BIGINT, v STRING)")
    Seq((1L, "a")).toDF("k", "v").createOrReplaceTempView("cdc_span_b1")
    spark.sql("INSERT INTO lakehouse.cdc.span SELECT * FROM cdc_span_b1")
    spark.sql("ALTER TABLE lakehouse.cdc.span ADD COLUMN extra BIGINT")
    Seq((2L, "b", 7L)).toDF("k", "v", "extra").createOrReplaceTempView("cdc_span_b2")
    spark.sql("INSERT INTO lakehouse.cdc.span SELECT * FROM cdc_span_b2")

    // default stays fail-fast, with the opt-in named in the message
    val e = intercept[Exception] {
      spark.table("lakehouse.cdc.span.changes").collect()
    }
    e.getMessage should include("split the changelog read")

    // opted in: pre-DDL epoch projects, added column null
    val rows = spark.read.option("spanSchemaChanges", "true")
      .table("lakehouse.cdc.span.changes")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getString(3))).toSet
    rows shouldBe Set((1L, None, "insert"), (2L, Some(7L), "insert"))

    // span mode over a fully EXPIRED window surfaces the actionable
    // re-sync error (the non-span path's diagnostic), never empty.reduce
    val lt = spark.sessionState.catalogManager.catalog("lakehouse")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("cdc"), "span"))
      .asInstanceOf[graft.catalog.LakehouseTable]
    val cur = TableMetadata.load(lt.tableDir).version
    graft.catalog.Maintenance.expireSnapshots(
      spark, "lakehouse", Seq("cdc"), "span", retainVersions = 1)
    val expired = intercept[Exception] {
      spark.read.option("spanSchemaChanges", "true")
        .option("startingVersion", "1").option("endingVersion", (cur - 1).toString)
        .table("lakehouse.cdc.span.changes").collect()
    }
    expired.getMessage.toLowerCase should include("expired")
    spark.sql("DROP TABLE lakehouse.cdc.span")
  }

  test("a partial window starts from the requested snapshot") {
    val cl = changelog(3, 4).collect()
    cl.map(_.getString(2)).toSeq.sorted shouldBe Seq("delete", "delete", "delete")
    cl.map(_.getLong(0)).sorted.toSeq shouldBe Seq(1L, 2L, 3L)
  }

  test("schema change inside the window is rejected with a split hint") {
    val lt = spark.sessionState.catalogManager.catalog("lakehouse")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(Array("cdc"), "t"))
      .asInstanceOf[graft.catalog.LakehouseTable]
    val cur = TableMetadata.load(lt.tableDir)
    val renamed = org.apache.spark.sql.types.StructType(cur.schema.fields.map(f =>
      if (f.name == "v") f.copy(name = "v2") else f))
    TableMetadata.commit(lt.tableDir, cur.copy(version = cur.version + 1, schema = renamed))
    val e = intercept[IllegalArgumentException] {
      changelog(cur.version - 1, cur.version + 1)
    }
    e.getMessage should include("split the changelog read")
  }
}
