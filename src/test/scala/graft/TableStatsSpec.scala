package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.catalog.TableStats

/** ANALYZE: one-pass table/column stats published as properties and
  * served through the DSv2 scan into catalyst plan statistics. */
class TableStatsSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("analyze records row count, ndv, null count, string lengths; scan reports them") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.stats_ns")
    spark.sql("CREATE TABLE lakehouse.stats_ns.t (k INT, v STRING)")
    (0 until 500).map(i => (i % 10, if (i % 5 == 0) null else s"val_${i % 25}"))
      .toDF("k", "v").createOrReplaceTempView("stats_src")
    spark.sql("INSERT INTO lakehouse.stats_ns.t SELECT * FROM stats_src")

    spark.sql("CALL lakehouse.system.analyze('stats_ns', 't', '')")
      .collect()(0).getLong(0) shouldBe 500L

    val lt = spark.sessionState.catalogManager.catalog("lakehouse")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("stats_ns"), "t"))
      .asInstanceOf[graft.catalog.LakehouseTable]
    val props = lt.meta.properties
    TableStats.numRows(props) shouldBe Some(500L)
    val cs = TableStats.columnStats(props, lt.meta.schema)
    cs.keySet shouldBe Set("k", "v")
    cs("k").distinctCount().getAsLong shouldBe 10L +- 1L // HLL++ estimate
    cs("k").nullCount().getAsLong shouldBe 0L
    cs("v").nullCount().getAsLong shouldBe 100L
    // i%25 ∈ {0,5,10,15,20} implies i%5==0 → null, so 20 distinct remain
    cs("v").distinctCount().getAsLong shouldBe 20L +- 2L
    cs("v").maxLen().getAsLong shouldBe 6L // "val_NN"

    // stats flow into catalyst: the optimized plan sees rowCount + ndv
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled", "false")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val plan = spark.table("lakehouse.stats_ns.t").queryExecution.optimizedPlan
      val stats = plan.stats
      stats.rowCount shouldBe Some(BigInt(500))
      val ndvByName = stats.attributeStats.map { case (a, st) =>
        a.name -> st.distinctCount.map(_.toLong)
      }.toMap
      ndvByName.get("k").flatten.getOrElse(0L) should be >= 9L
    } finally spark.conf.set("spark.sql.cbo.enabled", prevCbo)
    spark.sql("DROP TABLE lakehouse.stats_ns.t")
  }

  test("histogram pass job count does not grow with the column count") {
    // the old shape ran one groupBy-collect JOB PER RANGED COLUMN — on
    // a wide table that is N sequential full scans; the stacked shape
    // is one job for all columns
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.stats_ns")
    def mk(name: String, intCols: Int): Unit = {
      val cols = (1 to intCols).map(i => s"k$i INT").mkString(", ")
      spark.sql(s"CREATE TABLE lakehouse.stats_ns.$name ($cols)")
      val src = spark.range(500).selectExpr(
        (1 to intCols).map(i => s"CAST(id * $i % 97 AS INT) AS k$i"): _*)
      src.createOrReplaceTempView(s"stats_w_src_$name")
      spark.sql(s"INSERT INTO lakehouse.stats_ns.$name SELECT * FROM stats_w_src_$name")
    }
    mk("narrow", 1)
    mk("wide", 6)
    def jobsFor(table: String): Int = {
      val group = s"analyze-jobs-$table"
      spark.sparkContext.setJobGroup(group, group)
      try TableStats.analyze(spark, "lakehouse", Seq("stats_ns"), table, histogramBins = 4)
      finally spark.sparkContext.clearJobGroup()
      spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
    }
    val narrowJobs = jobsFor("narrow")
    val wideJobs = jobsFor("wide")
    withClue(s"narrow=$narrowJobs wide=$wideJobs: ") {
      wideJobs shouldBe narrowJobs
    }
    // and the wide table's histograms are all present and sane
    val lt = spark.sessionState.catalogManager.catalog("lakehouse")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("stats_ns"), "wide"))
      .asInstanceOf[graft.catalog.LakehouseTable]
    val cs = TableStats.columnStats(lt.meta.properties, lt.meta.schema)
    (1 to 6).foreach { i =>
      val h = cs(s"k$i").histogram().get()
      h.bins() should have length 4
      h.height() shouldBe 125.0 +- 1.0
    }
    spark.sql("DROP TABLE lakehouse.stats_ns.narrow")
    spark.sql("DROP TABLE lakehouse.stats_ns.wide")
  }

  test("analyze counts only live rows while merge-on-read deletes are pending") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.stats_ns")
    spark.sql("CREATE TABLE lakehouse.stats_ns.mor (k INT, v STRING)")
    (0 until 300).map(i => (i, s"v$i")).toDF("k", "v")
      .createOrReplaceTempView("stats_mor_src")
    spark.sql("INSERT INTO lakehouse.stats_ns.mor SELECT * FROM stats_mor_src")
    graft.catalog.MergeOnRead.morDelete(spark, "lakehouse", Seq("stats_ns"), "mor",
      (0 until 50).toDF("k"))
    // raw data files still hold 300 rows; stats must see 250 or CBO
    // plans against logically-deleted rows
    spark.sql("CALL lakehouse.system.analyze('stats_ns', 'mor', '')")
      .collect()(0).getLong(0) shouldBe 250L
    val lt = spark.sessionState.catalogManager.catalog("lakehouse")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("stats_ns"), "mor"))
      .asInstanceOf[graft.catalog.LakehouseTable]
    TableStats.numRows(lt.meta.properties) shouldBe Some(250L)
    val cs = TableStats.columnStats(lt.meta.properties, lt.meta.schema)
    cs("k").distinctCount().getAsLong.toDouble shouldBe 250.0 +- 10.0
    spark.sql("DROP TABLE lakehouse.stats_ns.mor")
  }

  test("analyze with histogram_bins records min/max and an equi-height histogram") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.stats_ns")
    spark.sql("CREATE TABLE lakehouse.stats_ns.h (k INT, v STRING)")
    // skewed domain: 90% of rows in [0, 10), a thin tail to 1000 —
    // exactly where a bare [min, max] misleads range selectivity
    (0 until 1000).map(i => (if (i < 900) i % 10 else i, s"v$i"))
      .toDF("k", "v").createOrReplaceTempView("stats_hsrc")
    spark.sql("INSERT INTO lakehouse.stats_ns.h SELECT * FROM stats_hsrc")

    spark.sql("CALL lakehouse.system.analyze('stats_ns', 'h', '', histogram_bins => 4)")
      .collect()(0).getLong(0) shouldBe 1000L

    val lt = spark.sessionState.catalogManager.catalog("lakehouse")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("stats_ns"), "h"))
      .asInstanceOf[graft.catalog.LakehouseTable]
    val cs = TableStats.columnStats(lt.meta.properties, lt.meta.schema)
    cs("k").min().get() shouldBe 0
    cs("k").max().get() shouldBe 999
    val hist = cs("k").histogram().get()
    hist.bins() should have length 4
    hist.height() shouldBe 250.0 +- 1.0
    // equi-height on the skewed domain: the first bins stay inside the
    // dense [0, 10) head, the last reaches the tail
    hist.bins().head.hi() should be <= 10.0
    hist.bins().last.hi() shouldBe 999.0 +- 1.0
    // strings get no histogram; the catalyst plan carries min/max
    cs("v").histogram().isPresent shouldBe false
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled", "false")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.statistics.histogram.enabled", "true")
      val stats = spark.table("lakehouse.stats_ns.h").queryExecution.optimizedPlan.stats
      val kStat = stats.attributeStats.find(_._1.name == "k").map(_._2).get
      kStat.min shouldBe Some(0)
      kStat.max shouldBe Some(999)
      kStat.histogram.isDefined shouldBe true
      kStat.histogram.get.bins should have length 4
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", prevCbo)
      spark.conf.unset("spark.sql.statistics.histogram.enabled")
    }
    spark.sql("DROP TABLE lakehouse.stats_ns.h")
  }
}
