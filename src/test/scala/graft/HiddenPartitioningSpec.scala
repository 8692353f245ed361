package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.catalog.LakehouseTable

/** Hidden partitioning transforms (days/hours/truncate — Iceberg's
  * event-table idiom): write-side clustering by the derived value plus
  * the engine's footer-stats pruning = partition pruning on the SOURCE
  * column with no derived column stored or queried. */
class HiddenPartitioningSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def loadTable(name: String): LakehouseTable =
    spark.sessionState.catalogManager.catalog("lakehouse")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(Array("hp_ns"), name))
      .asInstanceOf[LakehouseTable]

  test("days(ts): day-clustered files, source-column filter prunes them") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.hp_ns")
    spark.sql(
      "CREATE TABLE lakehouse.hp_ns.ev (ev_id BIGINT, ts TIMESTAMP, v STRING) " +
        "PARTITIONED BY (days(ts))")

    // one INSERT spanning three days — the hidden transform must split
    // it into day-clustered files inside the single commit
    val rows = (0 until 300).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2026-03-${i % 3 + 1}%02d 08:${i % 60}%02d:00"),
        s"v$i")
    }
    rows.toDF("ev_id", "ts", "v").createOrReplaceTempView("hp_src")
    spark.sql("INSERT INTO lakehouse.hp_ns.ev SELECT * FROM hp_src")

    val total = spark.sql("SELECT COUNT(*) FROM lakehouse.hp_ns.ev.files")
      .collect()(0).getLong(0).toInt
    total should be >= 3 // at least one file per day

    // the user queries ts, never a derived day column — one day's
    // window must scan only that day's files
    val oneDay = spark.table("lakehouse.hp_ns.ev")
      .filter($"ts" >= "2026-03-02 00:00:00" && $"ts" < "2026-03-03 00:00:00")
    oneDay.count() shouldBe 100
    val (survivors, all) = LakehouseTable.lastScanFileCounts.get()
    all shouldBe total
    survivors should be < total

    // DESCRIBE reports the transform exactly as declared
    val parts = loadTable("ev").partitioning().map(_.toString)
    parts should contain("days(ts)")
    spark.sql("DROP TABLE lakehouse.hp_ns.ev")
  }

  test("truncate(w, col): prefix-clustered strings, integral floor-to-width") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.hp_ns")
    spark.sql(
      "CREATE TABLE lakehouse.hp_ns.tr (k BIGINT, tag STRING) " +
        "PARTITIONED BY (truncate(4, tag))")
    (0 until 200).map(i => (i.toLong, f"p${i % 4}%03d-item$i"))
      .toDF("k", "tag").createOrReplaceTempView("hp_src2")
    spark.sql("INSERT INTO lakehouse.hp_ns.tr SELECT * FROM hp_src2")

    val total = spark.sql("SELECT COUNT(*) FROM lakehouse.hp_ns.tr.files")
      .collect()(0).getLong(0).toInt
    total should be >= 4
    spark.table("lakehouse.hp_ns.tr").filter($"tag".startsWith("p002")).count() shouldBe 50
    val (survivors, _) = LakehouseTable.lastScanFileCounts.get()
    survivors should be < total

    // integral truncate floors toward -inf (Iceberg semantics)
    import graft.catalog.HiddenPartitioning
    val t = HiddenPartitioning.HiddenTransform("truncate", Some(10), "k")
    val out = Seq(-11L, -10L, -1L, 0L, 9L, 10L).toDF("k")
      .select(t.expr($"k", org.apache.spark.sql.types.LongType).as("b"))
      .collect().map(_.getLong(0)).toSeq
    out shouldBe Seq(-20L, -10L, -10L, 0L, 0L, 10L)
    spark.sql("DROP TABLE lakehouse.hp_ns.tr")
  }

  test("invalid transform columns or types fail at CREATE, not first write") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.hp_ns")
    // Spark may surface the catalog's IllegalArgumentException directly
    // or wrapped in an AnalysisException — either way, CREATE fails
    def createFails(ddl: String, fragment: String): Unit = {
      val e = intercept[Exception](spark.sql(ddl))
      Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .exists(t => Option(t.getMessage).exists(_.contains(fragment))) shouldBe true
    }
    // (Spark's own analysis may reject the unknown column before the
    // catalog's validate sees it — either error names the column)
    createFails(
      "CREATE TABLE lakehouse.hp_ns.bad1 (k BIGINT) PARTITIONED BY (days(nope))",
      "nope")
    createFails(
      "CREATE TABLE lakehouse.hp_ns.bad2 (k BIGINT, s STRING) PARTITIONED BY (days(s))",
      "needs a timestamp/date column")
    createFails(
      "CREATE TABLE lakehouse.hp_ns.bad3 (k BIGINT, ts TIMESTAMP) " +
        "PARTITIONED BY (truncate(4, ts))",
      "needs a string or integral column")
    spark.sql("SHOW TABLES IN lakehouse.hp_ns").collect()
      .map(_.getString(1)) should not contain "bad1"
  }

  test("partition-spec evolution: set_partitioning adopts a hidden transform") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.hp_ns")
    spark.sql("CREATE TABLE lakehouse.hp_ns.evolve (k BIGINT, ts TIMESTAMP)")
    (0 until 100).map(i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2026-04-${i % 2 + 1}%02d 09:00:00")))
      .toDF("k", "ts").createOrReplaceTempView("hp_ev_src")
    spark.sql("INSERT INTO lakehouse.hp_ns.evolve SELECT * FROM hp_ev_src")
    val filesBefore = spark.sql("SELECT COUNT(*) FROM lakehouse.hp_ns.evolve.files")
      .collect()(0).getLong(0)

    // metadata-only evolution: old files keep their layout
    spark.sql("CALL lakehouse.system.set_partitioning('hp_ns', 'evolve', 'days(ts)')")
    spark.sql("SELECT COUNT(*) FROM lakehouse.hp_ns.evolve.files")
      .collect()(0).getLong(0) shouldBe filesBefore
    loadTable("evolve").partitioning().map(_.toString) should contain("days(ts)")

    // new commits cluster under the evolved spec
    (100 until 300).map(i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2026-05-${i % 2 + 1}%02d 09:00:00")))
      .toDF("k", "ts").createOrReplaceTempView("hp_ev_src2")
    spark.sql("INSERT INTO lakehouse.hp_ns.evolve SELECT * FROM hp_ev_src2")
    spark.table("lakehouse.hp_ns.evolve")
      .filter($"ts" >= "2026-05-02 00:00:00").count() shouldBe 100
    val (survivors, total) = LakehouseTable.lastScanFileCounts.get()
    survivors should be < total
    spark.table("lakehouse.hp_ns.evolve").count() shouldBe 300
    spark.sql("DROP TABLE lakehouse.hp_ns.evolve")
  }

  test("hidden transforms compose with identity partitions") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.hp_ns")
    spark.sql(
      "CREATE TABLE lakehouse.hp_ns.mix (k BIGINT, ts TIMESTAMP, region STRING) " +
        "PARTITIONED BY (region, days(ts))")
    (0 until 100).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2026-03-${i % 2 + 1}%02d 10:00:00"),
        if (i % 2 == 0) "eu" else "us")
    }.toDF("k", "ts", "region").createOrReplaceTempView("hp_src3")
    spark.sql("INSERT INTO lakehouse.hp_ns.mix SELECT * FROM hp_src3")
    spark.table("lakehouse.hp_ns.mix")
      .filter($"region" === "eu" && $"ts" < "2026-03-02 00:00:00").count() shouldBe 50
    val (survivors, total) = LakehouseTable.lastScanFileCounts.get()
    survivors should be < total
    spark.sql("DROP TABLE lakehouse.hp_ns.mix")
  }
}
