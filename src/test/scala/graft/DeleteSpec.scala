package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Row-level DELETE: copy-on-write with file-level pruning. */
class DeleteSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def files(t: String): Seq[String] =
    spark.sql(s"SELECT file_path FROM $t.files").collect().map(_.getString(0)).toSeq

  test("DELETE rewrites only the files holding matches; time travel intact") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.del_ns")
    spark.sql("CREATE TABLE lakehouse.del_ns.d (k INT, v STRING) PARTITIONED BY (k)")
    // three commits with disjoint key ranges → three files with disjoint stats
    (0 until 3).foreach { c =>
      (0 until 100).map(i => (c * 10 + i % 10, s"v$c-$i")).toDF("k", "v")
        .createOrReplaceTempView("del_src")
      spark.sql("INSERT INTO lakehouse.del_ns.d SELECT * FROM del_src")
    }
    val before = files("lakehouse.del_ns.d")
    spark.table("lakehouse.del_ns.d").count() shouldBe 300

    // predicate hits only commit 1's key range (k in [10,20))
    spark.sql("DELETE FROM lakehouse.del_ns.d WHERE k = 15")
    spark.table("lakehouse.del_ns.d").count() shouldBe 290
    spark.table("lakehouse.del_ns.d").where($"k" === 15).count() shouldBe 0

    // untouched files carried by REFERENCE into the new snapshot
    val after = files("lakehouse.del_ns.d")
    val untouched = before.filter(f => !f.contains("-delete-"))
    (after.toSet intersect before.toSet).size shouldBe before.size - 1
    after.count(_.contains("-delete-")) should be >= 1

    // time travel: the pre-delete snapshot still sees all 300 rows
    val preDeleteVersion = spark.sql(
      "SELECT MAX(version) FROM lakehouse.del_ns.d.history WHERE operation <> 'delete'")
      .collect()(0).getInt(0)
    spark.sql(s"SELECT * FROM lakehouse.del_ns.d VERSION AS OF $preDeleteVersion")
      .count() shouldBe 300

    // history records the delete
    spark.sql("SELECT operation FROM lakehouse.del_ns.d.history ORDER BY version")
      .collect().last.getString(0) shouldBe "delete"
    spark.sql("DROP TABLE lakehouse.del_ns.d")
  }

  test("updateWhere rewrites matches in place; upsert replaces and inserts") {
    import graft.catalog.Maintenance
    import org.apache.spark.sql.functions.{col, lit}
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.del_ns")
    spark.sql("CREATE TABLE lakehouse.del_ns.u (k INT, v STRING) PARTITIONED BY (k)")
    (0 until 2).foreach { c =>
      (0 until 50).map(i => (c * 5 + i % 5, s"v$c-$i")).toDF("k", "v")
        .createOrReplaceTempView("u_src")
      spark.sql("INSERT INTO lakehouse.del_ns.u SELECT * FROM u_src")
    }

    // UPDATE: only rows with k=7 change; table size unchanged
    Maintenance.updateWhere(spark, "lakehouse", Seq("del_ns"), "u",
      col("k") === 7, Map("v" -> lit("patched"))) should be >= 1
    spark.table("lakehouse.del_ns.u").count() shouldBe 100
    spark.table("lakehouse.del_ns.u").where($"v" === "patched").count() shouldBe 10
    spark.table("lakehouse.del_ns.u").where($"k" =!= 7 && $"v" === "patched")
      .count() shouldBe 0

    // UPSERT: key 7 rows replaced by ONE row, new key 99 inserted
    val src = Seq((7, "merged"), (99, "new")).toDF("k", "v")
    Maintenance.upsert(spark, "lakehouse", Seq("del_ns"), "u", src, Seq("k"))
    val t = spark.table("lakehouse.del_ns.u")
    t.where($"k" === 7).collect().map(_.getString(1)).toSeq shouldBe Seq("merged")
    t.where($"k" === 99).collect().map(_.getString(1)).toSeq shouldBe Seq("new")
    t.count() shouldBe 100 - 10 + 1 + 1 // 10 old k=7 rows → 1, plus k=99
    spark.sql("SELECT operation FROM lakehouse.del_ns.u.history ORDER BY version")
      .collect().map(_.getString(0)).takeRight(2).toSeq shouldBe Seq("update", "merge")
    spark.sql("DROP TABLE lakehouse.del_ns.u")
  }

  test("DELETE matching nothing is a metadata no-op; NULLs are kept") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.del_ns")
    spark.sql("CREATE TABLE lakehouse.del_ns.n (k INT, v DOUBLE)")
    Seq((1, Some(1.0)), (2, None), (3, Some(3.0)))
      .map { case (k, v) => (k, v.map(Double.box).orNull) }
      .toDF("k", "v").createOrReplaceTempView("n_src")
    spark.sql("INSERT INTO lakehouse.del_ns.n SELECT * FROM n_src")
    val v1 = spark.sql("SELECT MAX(version) FROM lakehouse.del_ns.n.history")
      .collect()(0).getInt(0)

    // stats prove k=99 can't match → no rewrite, no new version
    spark.sql("DELETE FROM lakehouse.del_ns.n WHERE k = 99")
    spark.sql("SELECT MAX(version) FROM lakehouse.del_ns.n.history")
      .collect()(0).getInt(0) shouldBe v1

    // DELETE keeps rows where the predicate is NULL (SQL semantics)
    spark.sql("DELETE FROM lakehouse.del_ns.n WHERE v > 2.0")
    val left = spark.table("lakehouse.del_ns.n").orderBy($"k").collect()
    left.map(_.getInt(0)).toSeq shouldBe Seq(1, 2) // k=3 deleted, NULL row kept
    spark.sql("DROP TABLE lakehouse.del_ns.n")
  }
}
