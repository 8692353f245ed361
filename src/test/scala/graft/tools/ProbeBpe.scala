package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** Dev diagnostic: times q76/q79 at sf0.1 (3 runs each) to measure the
  * every-3-rounds checkpoint in bpeLearnApply. Run manually:
  * `sbt "testOnly graft.tools.ProbeBpe"`. */
class ProbeBpe extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val sf = "/root/testdata/sf0.1"

  test("time q76/q79 at sf0.1, pin vs no-pin") {
    for (disable <- Seq("false", "true");
         q <- Seq(graft.queries.TextOps.q76, graft.queries.TextOps.q79)) {
      spark.conf.set(graft.Materialize.DisableConf, disable)
      try {
        val times = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          q.run(spark, sf).collect()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[probe] ${q.name} disable=$disable: " +
          f"min ${times.min}%.2f med ${times.sorted.apply(1)}%.2f")
      } finally spark.conf.unset(graft.Materialize.DisableConf)
    }
  }
}
