package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.queries.VectorOps

/** ANN quality gates: the approximate paths must reach useful recall
  * against the exact brute-force top-k on the fixture corpus, and the
  * aggregator-based top-k must match it exactly. */
class VectorSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def topkSet(name: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, sf)
      .select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("aggregator top-k equals windowed top-k exactly") {
    topkSet("q29d_topk_agg") shouldBe topkSet("q29_cosine_topk")
  }

  test("LSH ANN recall vs exact top-5") {
    val exact = topkSet("q29_cosine_topk")
    val lsh = topkSet("q29c_ann_lsh")
    val recall = (exact intersect lsh).size.toDouble / exact.size
    // random-hyperplane LSH on near-orthogonal synthetic vectors is the
    // hard case; it must still find a meaningful fraction
    recall should be >= 0.2
  }

  test("IVF ANN recall vs exact top-5") {
    val exact = topkSet("q29_cosine_topk")
    val ivf = topkSet("q29e_ann_ivf")
    val recall = (exact intersect ivf).size.toDouble / exact.size
    recall should be >= 0.5 // nprobe=4 of k=16 cells
  }

  test("PQ-ADC ANN clears its recall floor in-plan") {
    // q29f emits the exact top-5 (oracle-checked) + recall_ok: the PQ
    // shortlist's recall@5 against those rows must clear 0.4 at the
    // fixture — asserted here from the flag the plan itself computes
    val flags = SparkEntry.queries("q29f_ann_pq")(spark, sf)
      .select("recall_ok").distinct().collect().map(_.getBoolean(0)).toSeq
    flags shouldBe Seq(true)
  }
}
