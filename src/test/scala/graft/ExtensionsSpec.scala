package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The extensions path (`spark.sql.extensions=graft.functions.
  * GraftExtensions`, set on the shared test session at build time —
  * it's a static conf) must make the native functions SQL-callable
  * with no per-session registration call. */
class ExtensionsSpec extends AnyFunSuite with Matchers {

  test("spark.sql.extensions installs vec_dot/vec_norm_sq for plain SQL") {
    val r = TestSpark.spark.sql(
      "SELECT vec_dot(array(1.0f, 2.0f), array(3.0f, 4.0f)) AS d, " +
        "vec_norm_sq(array(3.0f, 4.0f)) AS n").collect()(0)
    r.getDouble(0) shouldBe 11.0
    r.getDouble(1) shouldBe 25.0
  }

  test("spark.sql.extensions installs the signature aggregates for plain SQL") {
    val spark = TestSpark.spark
    import spark.implicits._
    Seq((1L, 42L), (1L, -7L)).toDF("g", "h").createOrReplaceTempView("ext_hashes")
    val r = spark.sql(
      """SELECT simhash_agg(h) AS sh, size(minhash_agg(h, 16)) AS mk,
        |       size(minhash_bands(h, 16, 4)) AS mb
        |FROM ext_hashes GROUP BY g""".stripMargin).collect()(0)
    r.getLong(0) should not be 0L
    r.getInt(1) shouldBe 16
    r.getInt(2) shouldBe 4
    // float×double kernel callable from SQL too
    spark.sql("SELECT vec_dot_d(array(1.0f, 2.0f), array(3.0d, 4.0d)) AS d")
      .collect()(0).getDouble(0) shouldBe 11.0
  }
}
