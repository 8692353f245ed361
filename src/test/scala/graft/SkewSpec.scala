package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.SkewOps

class SkewSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // power-law: 90% of rows share key 0
  private lazy val skewed = (0 until 10000)
    .map(i => (if (i % 10 == 0) i % 7 else 0, i)).toDF("k", "v")
  private lazy val dim = (0 until 7).map(i => (i, s"name$i")).toDF("k", "name")

  test("salted inner join equals plain join") {
    val plain = skewed.join(dim, Seq("k")).select("k", "v", "name")
    val salted = SkewOps.saltedJoin(skewed, dim, "k", salts = 8)
      .select("k", "v", "name")
    salted.count() shouldBe plain.count()
    salted.except(plain).count() shouldBe 0
    plain.except(salted).count() shouldBe 0
  }

  test("salted left join preserves unmatched rows") {
    val withMissing = skewed.union(Seq((99, -1)).toDF("k", "v"))
    val salted = SkewOps.saltedJoin(withMissing, dim, "k", salts = 4, "left")
    salted.count() shouldBe withMissing.count()
    salted.where($"k" === 99).select("name").collect()(0).isNullAt(0) shouldBe true
  }

  test("salting spreads a hot key across sub-keys") {
    val salted = skewed
      .withColumn("__salt",
        org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.xxhash64(
            skewed.columns.map(org.apache.spark.sql.functions.col): _*),
          org.apache.spark.sql.functions.lit(8)))
    val hotKeySalts = salted.where($"k" === 0).select("__salt").distinct().count()
    hotKeySalts shouldBe 8 // the 9000-row key now occupies 8 sub-keys
  }

  test("connected components: chains, triangles, singletons resolve to min label") {
    import graft.queries.TextOps
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21} (pair)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("id1", "id2")
    val cc = TextOps.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    cc(1L) shouldBe 1L; cc(2L) shouldBe 1L; cc(3L) shouldBe 1L; cc(4L) shouldBe 1L
    cc(10L) shouldBe 10L; cc(11L) shouldBe 10L; cc(12L) shouldBe 10L
    cc(20L) shouldBe 20L; cc(21L) shouldBe 20L
  }

  test("salted two-phase aggregation matches groupBy") {
    val expected = skewed.groupBy("k")
      .agg(org.apache.spark.sql.functions.sum($"v").as("sum"),
        org.apache.spark.sql.functions.count($"v").as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val got = SkewOps.saltedSumCount(skewed, "k", $"v", salts = 8)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    got shouldBe expected
  }
}
