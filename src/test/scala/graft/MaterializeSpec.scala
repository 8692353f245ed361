package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The eager-materialization pin behind q38 / connected components /
  * merge-on-read UPDATE: localCheckpoint by default, a RELIABLE
  * checkpoint when `graft.checkpoint.reliable=true` — the conf-gated
  * fault-tolerance story for cluster scale. */
class MaterializeSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  test("default pin localCheckpoints; reliable mode demands and uses a checkpoint dir") {
    Materialize.pin(spark.range(100).toDF("id")).count() shouldBe 100

    spark.conf.set(Materialize.ReliableConf, "true")
    try {
      if (spark.sparkContext.getCheckpointDir.isEmpty) {
        val e = intercept[IllegalArgumentException] {
          Materialize.pin(spark.range(10).toDF("id"))
        }
        e.getMessage should include("setCheckpointDir")
      }
      spark.sparkContext.setCheckpointDir(
        java.nio.file.Files.createTempDirectory("graft-reliable-ckpt-").toString)
      Materialize.pin(spark.range(50).toDF("id")).count() shouldBe 50
      // a pinned hot path runs end-to-end in reliable mode with
      // unchanged results
      val reliable = graft.queries.TextOps.q38.run(spark, "/root/testdata/sf0.001").collect()
      spark.conf.unset(Materialize.ReliableConf)
      val default = graft.queries.TextOps.q38.run(spark, "/root/testdata/sf0.001").collect()
      reliable shouldBe default
    } finally spark.conf.unset(Materialize.ReliableConf)
  }

  test("a pin drops hash partitioning across the cut (documented limitation)") {
    // Callers must not position a pin to save a downstream exchange:
    // the checkpointed frame reports UnknownPartitioning, so a re-agg
    // on the pinned keys re-shuffles. If a Spark upgrade starts
    // preserving partitioning here, this test fails and the pin
    // placement guidance in Materialize's scaladoc should be revisited
    // (several query shapes could then drop an exchange).
    import org.apache.spark.sql.functions._
    val pinned = Materialize.pin(
      spark.range(10000L)
        .select((col("id") % 97).as("p"), (col("id") % 13).as("w"))
        .repartition(col("p"), col("w")))
    pinned.queryExecution.executedPlan.outputPartitioning.toString should
      include("UnknownPartitioning")
    val reagg = pinned.groupBy("p", "w").count()
    reagg.collect()
    reagg.queryExecution.executedPlan.toString should include("Exchange")
  }
}
