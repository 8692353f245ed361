package graft

import org.scalatest.funsuite.AnyFunSuite

/** Executes EVERY `SparkEntry.queries` entry end-to-end at sf0.001 and
  * fails loudly on any exception. This is the in-repo guard the r9
  * events-fixture breakage lacked: a loader/fixture-schema change that
  * breaks a whole query family must turn `sbt test` red here, instead of
  * surviving to the driver's gates (which drop erroring queries from
  * CORRECTNESS silently). Runs each query to completion (count), so
  * analysis-time AND execution-time failures both surface.
  */
class SmokeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("every SparkEntry query executes at sf0.001 without throwing") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val n = fn(spark, sf).count()
        assert(n >= 0)
        None
      } catch {
        case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" | ")}")
      }
    }
    assert(failures.isEmpty, s"\n${failures.size} queries failed:\n  ${failures.mkString("\n  ")}")
  }

  test("entry() flagship returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every queries entry has an oracle or is a declared no-oracle op") {
    // Declared no-oracle set — keep minimal; the driver records only a
    // weaker rows-only check for these (SURVEY §2 / VERDICT r8 #6).
    val declaredNoOracle = Set("q28d_simhash")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- declaredNoOracle
    assert(missing.isEmpty, s"queries without oracle SQL: ${missing.toSeq.sorted.mkString(", ")}")
  }
}
