package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Runtime file skipping on ordinary reads — the DSv2 face of dynamic
  * partition pruning: a selective broadcast dim join hands its matched
  * partition values to the fact scan after the build side runs, and
  * whole fact files drop before any task reads them. */
class RuntimeFilterSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("selective dim join prunes fact files at runtime via partition column") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.rf_ns")
    spark.sql("CREATE TABLE lakehouse.rf_ns.fact (k INT, v BIGINT) PARTITIONED BY (k)")
    // one commit per partition value → files cluster tightly by k
    (0 until 8).foreach { k =>
      (0 until 200).map(i => (k, i.toLong)).toDF("k", "v").coalesce(1)
        .createOrReplaceTempView("rf_src")
      spark.sql("INSERT INTO lakehouse.rf_ns.fact SELECT * FROM rf_src")
    }
    spark.sql("CREATE TABLE lakehouse.rf_ns.dim (k INT, grp STRING)")
    (0 until 8).map(k => (k, if (k == 3) "pick" else "other")).toDF("k", "grp")
      .createOrReplaceTempView("rf_dim_src")
    spark.sql("INSERT INTO lakehouse.rf_ns.dim SELECT * FROM rf_dim_src")

    graft.catalog.LakehouseTable.lastRuntimeFilteredCounts = (0, 0)
    val joined = spark.table("lakehouse.rf_ns.fact")
      .join(
        org.apache.spark.sql.functions.broadcast(
          spark.table("lakehouse.rf_ns.dim").where($"grp" === "pick")),
        Seq("k"))
    joined.count() shouldBe 200

    // the runtime filter fired and pruned the fact scan to one file
    val (survivors, total) = graft.catalog.LakehouseTable.lastRuntimeFilteredCounts
    total shouldBe 8
    survivors shouldBe 1
    spark.sql("DROP TABLE lakehouse.rf_ns.fact")
    spark.sql("DROP TABLE lakehouse.rf_ns.dim")
  }

  test("scan with partition column pruned survives a runtime-filtered join") {
    // Regression: filterAttributes() used to report the partition
    // column unconditionally; once column pruning dropped it from the
    // scan output, Spark's PartitionPruning.getFilterableTableScan
    // threw `Unable to resolve p given [id, payload]` on ANY equi join
    // over the pruned scan (the TextIndex refresh → morUpsert shape).
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.rf_ns")
    spark.sql("DROP TABLE IF EXISTS lakehouse.rf_ns.part_fact")
    spark.sql("DROP TABLE IF EXISTS lakehouse.rf_ns.ids")
    spark.sql(
      "CREATE TABLE lakehouse.rf_ns.part_fact (id BIGINT, payload STRING, p INT) " +
        "PARTITIONED BY (p)")
    Seq.tabulate(100)(i => (i.toLong, s"pl$i", i % 4)).toDF("id", "payload", "p")
      .createOrReplaceTempView("rf_pf_src")
    spark.sql("INSERT INTO lakehouse.rf_ns.part_fact SELECT * FROM rf_pf_src")
    spark.sql("CREATE TABLE lakehouse.rf_ns.ids (id BIGINT)")
    Seq(3L, 17L, 42L).toDF("id").createOrReplaceTempView("rf_ids_src")
    spark.sql("INSERT INTO lakehouse.rf_ns.ids SELECT * FROM rf_ids_src")

    // project away the partition column, then join on a data column
    val pruned = spark.table("lakehouse.rf_ns.part_fact").select($"id", $"payload")
    val joined = pruned.join(
      org.apache.spark.sql.functions.broadcast(spark.table("lakehouse.rf_ns.ids")),
      Seq("id"))
    joined.collect().map(_.getLong(0)).sorted shouldBe Array(3L, 17L, 42L)

    spark.sql("DROP TABLE lakehouse.rf_ns.part_fact")
    spark.sql("DROP TABLE lakehouse.rf_ns.ids")
  }
}
