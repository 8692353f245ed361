package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.TextIndex

/** SQL faces for the q72-family searches: `CALL lakehouse.system.
  * {text,phrase,ranked,bm25}_search` must return the SAME rows as the
  * DataFrame-level TextIndex API — pure SQL end to end, no Scala. */
class SearchSqlSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val setup: Unit = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.srch")
    spark.sql("CREATE TABLE lakehouse.srch.docs (doc_id BIGINT, text STRING)")
    Seq(
      1L -> "spark scala lakehouse engine",
      2L -> "spark iceberg table format",
      3L -> "scala spark dedup pipeline spark",
      4L -> "unrelated tokens entirely here",
      5L -> "spark scala iceberg trio").toDF("doc_id", "text")
      .createOrReplaceTempView("srch_src")
    spark.sql("INSERT INTO lakehouse.srch.docs SELECT * FROM srch_src")
    // index built through SQL too — the whole lifecycle is CALL-able
    spark.sql("""CALL lakehouse.system.create_text_index(
                |'srch', 'docs', 'docs_idx', 'text', 'doc_id', 8)""".stripMargin)
  }

  test("CALL text_search matches TextIndex.searchAll") {
    setup
    val sql = spark.sql(
      "CALL lakehouse.system.text_search('srch', 'docs_idx', 'spark scala', 100)")
      .collect().map(_.getLong(0)).toSeq
    val api = TextIndex.searchAll(spark, "lakehouse", Seq("srch"), "docs_idx",
      Seq("spark", "scala")).collect().map(_.getLong(0)).toSeq
    sql shouldBe api
    sql shouldBe Seq(1L, 3L, 5L)
  }

  test("CALL phrase_search matches TextIndex.phraseSearch") {
    setup
    val sql = spark.sql(
      "CALL lakehouse.system.phrase_search('srch', 'docs_idx', 'spark scala', 100)")
      .collect().map(_.getLong(0)).toSeq
    val api = TextIndex.phraseSearch(spark, "lakehouse", Seq("srch"), "docs_idx",
      Seq("spark", "scala")).collect().map(_.getLong(0)).toSeq
    sql shouldBe api
    sql shouldBe Seq(1L, 5L) // doc 3 has both terms but never adjacent
  }

  test("CALL ranked_search and bm25_search match the DataFrame API, scores included") {
    setup
    val rankedSql = spark.sql(
      "CALL lakehouse.system.ranked_search('srch', 'docs_idx', 'spark iceberg', 3)")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val rankedApi = TextIndex.searchRanked(spark, "lakehouse", Seq("srch"), "docs_idx",
      Seq("spark", "iceberg"), 3).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    rankedSql shouldBe rankedApi

    val bm25Sql = spark.sql(
      "CALL lakehouse.system.bm25_search('srch', 'docs_idx', 'spark iceberg', 3, 1.2D, 0.75D)")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val bm25Api = TextIndex.searchBM25(spark, "lakehouse", Seq("srch"), "docs_idx",
      Seq("spark", "iceberg"), 3).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    bm25Sql shouldBe bm25Api
    bm25Sql.map(_._1).head shouldBe 2L // tf(iceberg)=1 short doc outranks
  }

  test("limit parameter bounds the driver materialization") {
    setup
    spark.sql("CALL lakehouse.system.text_search('srch', 'docs_idx', 'spark', 2)")
      .count() shouldBe 2L
  }
}
