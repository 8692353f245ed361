package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** SQL INSERT OVERWRITE surface: whole-table, static PARTITION(...)
  * (filtered overwrite, one commit), and dynamic partition overwrite. */
class InsertOverwriteSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def files(t: String): Seq[String] =
    spark.sql(s"SELECT file_path FROM $t.files").collect().map(_.getString(0)).toSeq

  private def seed(t: String): Unit = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.iow")
    spark.sql(s"CREATE TABLE $t (k INT, day STRING, v STRING) PARTITIONED BY (day)")
    Seq("a", "b", "c").foreach { d =>
      (0 until 10).map(i => (i, s"day-$d", s"old-$d-$i")).toDF("k", "day", "v")
        .createOrReplaceTempView("iow_src")
      spark.sql(s"INSERT INTO $t SELECT * FROM iow_src")
    }
  }

  test("static INSERT OVERWRITE PARTITION replaces one partition, carries the rest") {
    val t = "lakehouse.iow.t1"
    seed(t)
    val before = files(t)
    spark.table(t).count() shouldBe 30

    (100 until 105).map(i => (i, s"new-$i")).toDF("k", "v")
      .createOrReplaceTempView("iow_new")
    spark.sql(s"INSERT OVERWRITE $t PARTITION (day = 'day-b') SELECT k, v FROM iow_new")

    spark.table(t).count() shouldBe 25 // 10 + 5 + 10
    spark.table(t).where($"day" === "day-b").count() shouldBe 5
    spark.table(t).where($"day" === "day-b" && $"v".startsWith("old")).count() shouldBe 0
    spark.table(t).where($"day" === "day-a").count() shouldBe 10
    // one commit; the two untouched partitions' files carried by reference
    (files(t).toSet intersect before.toSet).size shouldBe before.size - 1
    spark.sql(s"SELECT operation FROM $t.history ORDER BY version")
      .collect().last.getString(0) shouldBe "overwrite-where"
    spark.sql(s"DROP TABLE $t")
  }

  test("whole-table INSERT OVERWRITE still truncates-and-replaces") {
    val t = "lakehouse.iow.t2"
    seed(t)
    Seq((1, "day-z", "fresh")).toDF("k", "day", "v").createOrReplaceTempView("iow_all")
    spark.sql(s"INSERT OVERWRITE $t SELECT * FROM iow_all")
    spark.table(t).collect().map(_.getString(2)) shouldBe Array("fresh")
    spark.sql(s"DROP TABLE $t")
  }

  test("dynamic partition overwrite replaces only the partitions present in the data") {
    val t = "lakehouse.iow.t3"
    seed(t)
    val before = files(t)
    Seq((200, "day-a", "dyn-a"), (201, "day-c", "dyn-c"))
      .toDF("k", "day", "v").createOrReplaceTempView("iow_dyn")
    spark.sql(
      "CALL lakehouse.system.overwrite_partitions('iow', 't3', 'iow_dyn')")
      .collect()(0).getLong(0) shouldBe 2

    spark.table(t).count() shouldBe 12 // day-b's 10 + the 2 new rows
    spark.table(t).where($"day" === "day-b").count() shouldBe 10
    spark.table(t).where($"day" === "day-a").collect().map(_.getString(2)) shouldBe
      Array("dyn-a")
    // day-b's file carried by reference
    (files(t).toSet intersect before.toSet).size should be >= 1
    spark.sql(s"DROP TABLE $t")
  }

  test("time travel sees the pre-overwrite partition") {
    val t = "lakehouse.iow.t4"
    seed(t)
    val preV = spark.sql(s"SELECT MAX(version) FROM $t.history").collect()(0).getInt(0)
    Seq((300, "replaced")).toDF("k", "v").createOrReplaceTempView("iow_tt")
    spark.sql(s"INSERT OVERWRITE $t PARTITION (day = 'day-a') SELECT k, v FROM iow_tt")
    spark.sql(s"SELECT * FROM $t VERSION AS OF $preV")
      .where($"day" === "day-a").count() shouldBe 10
    spark.sql(s"DROP TABLE $t")
  }
}
