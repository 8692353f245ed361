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
}
