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
}
