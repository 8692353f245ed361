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
