package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.catalog.Maintenance

class MaintenanceSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("compact rewrites many small commits into one file; vacuum reclaims the rest") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.maint_ns")
    spark.sql("CREATE TABLE lakehouse.maint_ns.m (k INT, v STRING)")
    (0 until 5).foreach { c =>
      Seq((c, s"v$c")).toDF("k", "v").createOrReplaceTempView("m_src")
      spark.sql("INSERT INTO lakehouse.maint_ns.m SELECT * FROM m_src")
    }
    def fileCount =
      spark.sql("SELECT count(*) FROM lakehouse.maint_ns.m.files").collect()(0).getLong(0)
    fileCount shouldBe 5

    val n = Maintenance.compact(spark, "lakehouse", Seq("maint_ns"), "m")
    n shouldBe 1
    fileCount shouldBe 1
    spark.table("lakehouse.maint_ns.m").count() shouldBe 5 // data intact
    spark.sql("SELECT * FROM lakehouse.maint_ns.m.history ORDER BY version")
      .collect().last.getAs[String]("operation") shouldBe "compact"

    // default retention window keeps just-written files (guards
    // in-flight commits whose metadata hasn't landed yet)
    Maintenance.vacuum(spark, "lakehouse", Seq("maint_ns"), "m") shouldBe 0

    // explicit retentionMs=0 (single-writer test): reclaim immediately
    val deleted = Maintenance.vacuum(spark, "lakehouse", Seq("maint_ns"), "m", retentionMs = 0L)
    deleted shouldBe 5 // the five original single-row files
    spark.table("lakehouse.maint_ns.m").count() shouldBe 5 // current unaffected

    // idempotent
    Maintenance.compact(spark, "lakehouse", Seq("maint_ns"), "m") shouldBe 1
    Maintenance.vacuum(spark, "lakehouse", Seq("maint_ns"), "m", retentionMs = 0L) shouldBe 0
    spark.sql("DROP TABLE lakehouse.maint_ns.m")
  }

  test("autoCompact rewrites only fragmented tables; healthy tables untouched") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.maint_ns")
    spark.sql("CREATE TABLE lakehouse.maint_ns.frag (k INT, v STRING)")
    // 6 tiny commits → 6 small files: fragmented vs any sane target
    (0 until 6).foreach { c =>
      Seq((c, s"v$c")).toDF("k", "v").createOrReplaceTempView("frag_src")
      spark.sql("INSERT INTO lakehouse.maint_ns.frag SELECT * FROM frag_src")
    }
    def nFiles = spark.sql("SELECT * FROM lakehouse.maint_ns.frag.files").count()
    nFiles shouldBe 6
    val v0 = spark.sql("SELECT MAX(version) FROM lakehouse.maint_ns.frag.history")
      .collect()(0).getInt(0)

    // with a large target, 6 files collapse into 1
    graft.catalog.Maintenance.autoCompact(
      spark, "lakehouse", Seq("maint_ns"), "frag") should be > 0
    nFiles shouldBe 1
    spark.table("lakehouse.maint_ns.frag").count() shouldBe 6

    // already healthy: metadata-only decision, NO new commit
    val v1 = spark.sql("SELECT MAX(version) FROM lakehouse.maint_ns.frag.history")
      .collect()(0).getInt(0)
    v1 shouldBe v0 + 1
    graft.catalog.Maintenance.autoCompact(
      spark, "lakehouse", Seq("maint_ns"), "frag") shouldBe 0
    spark.sql("SELECT MAX(version) FROM lakehouse.maint_ns.frag.history")
      .collect()(0).getInt(0) shouldBe v1

    // pending merge-on-read deletes make the rewrite overdue even when
    // the file count is at target
    graft.catalog.MergeOnRead.morDelete(spark, "lakehouse", Seq("maint_ns"), "frag",
      Seq(3).toDF("k"))
    graft.catalog.Maintenance.autoCompact(
      spark, "lakehouse", Seq("maint_ns"), "frag") should be > 0
    spark.table("lakehouse.maint_ns.frag").count() shouldBe 5
    spark.sql("SELECT * FROM lakehouse.maint_ns.frag.delete_files").count() shouldBe 0

    // procedure surface
    spark.sql("CALL lakehouse.system.auto_compact('maint_ns', 'frag', 134217728)")
      .collect()(0).getLong(0) shouldBe 0L
    spark.sql("DROP TABLE lakehouse.maint_ns.frag")
  }

  test("autoCompact lets small deltas accumulate below the churn threshold") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.maint_ns")
    spark.sql("DROP TABLE IF EXISTS lakehouse.maint_ns.churn")
    spark.sql("CREATE TABLE lakehouse.maint_ns.churn (k INT, v STRING)")
    // one data file, so only the delete-churn logic can trigger a rewrite
    (0 until 200).map(i => (i, s"v$i")).toDF("k", "v").coalesce(1)
      .createOrReplaceTempView("churn_src")
    spark.sql("INSERT INTO lakehouse.maint_ns.churn SELECT * FROM churn_src")
    def entries = spark.sql(
      "SELECT * FROM lakehouse.maint_ns.churn.delete_files").count()

    // 2 of 200 rows deleted (1%): one small entry, under both the
    // entry-count and deleted-fraction thresholds — the standing tick
    // must NOT rewrite the table for it
    graft.catalog.MergeOnRead.morDelete(spark, "lakehouse", Seq("maint_ns"), "churn",
      Seq(1, 2).toDF("k"))
    graft.catalog.Maintenance.autoCompact(
      spark, "lakehouse", Seq("maint_ns"), "churn") shouldBe 0
    entries shouldBe 1 // still pending, reads keep merging
    spark.table("lakehouse.maint_ns.churn").count() shouldBe 198

    // churn accumulates past the deleted-row fraction (22/200 = 11%):
    // now ONE rewrite amortizes all pending entries
    graft.catalog.MergeOnRead.morDelete(spark, "lakehouse", Seq("maint_ns"), "churn",
      (10 until 30).toDF("k"))
    graft.catalog.Maintenance.autoCompact(
      spark, "lakehouse", Seq("maint_ns"), "churn") should be > 0
    entries shouldBe 0
    spark.table("lakehouse.maint_ns.churn").count() shouldBe 178

    // entry-COUNT pressure, independent of the fraction: three tiny
    // entries (~1.7% of rows) with the knob at 2. The tick relieves it
    // the CHEAP way — consolidating the delete files into one entry —
    // and leaves the data files alone
    spark.conf.set("graft.maintenance.maxPendingDeleteEntries", "2")
    try {
      (40 until 43).foreach { k =>
        graft.catalog.MergeOnRead.morDelete(spark, "lakehouse", Seq("maint_ns"), "churn",
          Seq(k).toDF("k"))
      }
      entries shouldBe 3
      graft.catalog.Maintenance.autoCompact(
        spark, "lakehouse", Seq("maint_ns"), "churn") shouldBe 0
      entries shouldBe 1 // merged, still pending, reads keep merging
      spark.table("lakehouse.maint_ns.churn").count() shouldBe 175

      // UNMERGEABLE entry pressure (each delete straddles a data
      // commit, so the re-insert exemption forbids merging): only then
      // does the data-file rewrite run
      (50 until 53).foreach { k =>
        graft.catalog.MergeOnRead.morDelete(spark, "lakehouse", Seq("maint_ns"), "churn",
          Seq(k).toDF("k"))
        Seq((k, s"reborn$k")).toDF("k", "v").createOrReplaceTempView("churn_back")
        spark.sql("INSERT INTO lakehouse.maint_ns.churn SELECT * FROM churn_back")
      }
      entries shouldBe 4
      graft.catalog.Maintenance.autoCompact(
        spark, "lakehouse", Seq("maint_ns"), "churn") should be > 0
      entries shouldBe 0
      spark.table("lakehouse.maint_ns.churn").count() shouldBe 175
    } finally spark.conf.unset("graft.maintenance.maxPendingDeleteEntries")
    spark.sql("DROP TABLE lakehouse.maint_ns.churn")
  }

  test("dynamic partition overwrite replaces only the touched partitions") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.maint_ns")
    spark.sql("CREATE TABLE lakehouse.maint_ns.po (day INT, v STRING) PARTITIONED BY (day)")
    (1 to 3).foreach { d =>
      (0 until 10).map(i => (d, s"old-$d-$i")).toDF("day", "v")
        .createOrReplaceTempView("po_src")
      spark.sql("INSERT INTO lakehouse.maint_ns.po SELECT * FROM po_src")
    }
    // backfill day 2 with 3 rows; days 1 and 3 untouched
    val backfill = (0 until 3).map(i => (2, s"new-$i")).toDF("day", "v")
    Maintenance.overwritePartitions(spark, "lakehouse", Seq("maint_ns"), "po", backfill)
    val t = spark.table("lakehouse.maint_ns.po")
    t.count() shouldBe 10 + 3 + 10
    t.where($"day" === 2).collect().map(_.getString(1)).sorted shouldBe
      Array("new-0", "new-1", "new-2")
    t.where($"day" === 1 && $"v".startsWith("old")).count() shouldBe 10
    spark.sql("SELECT operation FROM lakehouse.maint_ns.po.history ORDER BY version")
      .collect().last.getString(0) shouldBe "overwrite-partitions"
    spark.sql("DROP TABLE lakehouse.maint_ns.po")
  }

  test("changesBetween reads exactly the rows added in a version window") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.maint_ns")
    spark.sql("CREATE TABLE lakehouse.maint_ns.cdc (k INT, v STRING)")
    (1 to 3).foreach { c =>
      (0 until 10).map(i => (c * 100 + i, s"c$c")).toDF("k", "v")
        .createOrReplaceTempView("cdc_src")
      spark.sql("INSERT INTO lakehouse.maint_ns.cdc SELECT * FROM cdc_src")
    }
    // versions: 1=create, 2..4=appends
    val delta = Maintenance.changesBetween(spark, "lakehouse", Seq("maint_ns"), "cdc", 2, 4)
    delta.count() shouldBe 20
    delta.select("v").distinct().collect().map(_.getString(0)).sorted shouldBe
      Array("c2", "c3")
    // empty window → empty frame with the table schema
    Maintenance.changesBetween(spark, "lakehouse", Seq("maint_ns"), "cdc", 4, 4)
      .count() shouldBe 0
    // windows crossing a rewrite commit are rejected, not miscounted
    Maintenance.compact(spark, "lakehouse", Seq("maint_ns"), "cdc")
    intercept[IllegalArgumentException] {
      Maintenance.changesBetween(spark, "lakehouse", Seq("maint_ns"), "cdc", 2, 5)
    }
    spark.sql("DROP TABLE lakehouse.maint_ns.cdc")
  }

  test("compacted partitioned table keeps file stats for skipping") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.maint_ns")
    spark.sql("CREATE TABLE lakehouse.maint_ns.p (k INT, v INT) PARTITIONED BY (k)")
    (0 until 4).foreach { c =>
      (0 until 100).map(i => (c, i)).toDF("k", "v").createOrReplaceTempView("p_src")
      spark.sql("INSERT INTO lakehouse.maint_ns.p SELECT * FROM p_src")
    }
    Maintenance.compact(spark, "lakehouse", Seq("maint_ns"), "p", targetFiles = 2)
    val df = spark.table("lakehouse.maint_ns.p").where($"k" === 2)
    df.count() shouldBe 100
    val (survivors, total) = graft.catalog.LakehouseTable.lastScanFileCounts.get()
    total should be <= 2
    survivors should be <= total
    spark.sql("DROP TABLE lakehouse.maint_ns.p")
  }

  test("zorder compaction bounds per-file ranges in EVERY clustered dimension") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.maint_ns")
    def mk(name: String): Unit = {
      spark.sql(s"CREATE TABLE lakehouse.maint_ns.$name (x INT, y INT)")
      val grid = for { x <- 0 until 100; y <- 0 until 100 } yield (x, y)
      grid.toDF("x", "y").createOrReplaceTempView("z_src")
      spark.sql(s"INSERT INTO lakehouse.maint_ns.$name SELECT * FROM z_src")
    }
    def spans(name: String, col: String): Seq[Double] = {
      val lt = spark.sessionState.catalogManager.catalog("lakehouse")
        .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
        .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
          Array("maint_ns"), name))
        .asInstanceOf[graft.catalog.LakehouseTable]
      lt.meta.files.flatMap(f => lt.meta.fileStats.get(f))
        .flatMap(_.get(col)).map(r => r.max.toDouble - r.min.toDouble)
    }

    mk("zlin")
    Maintenance.compact(spark, "lakehouse", Seq("maint_ns"), "zlin",
      targetFiles = 16, clusterBy = Seq("x", "y"))
    mk("zord")
    Maintenance.compact(spark, "lakehouse", Seq("maint_ns"), "zord",
      targetFiles = 16, clusterBy = Seq("x", "y"), zorder = true)

    // linear range clustering: x is tight but y spans ~the full domain
    // in every file — a filter on y alone skips nothing
    val linY = spans("zlin", "y")
    linY.max should be > 90.0
    // z-order: BOTH dimensions bounded per file (4x4 tiles for 16 files
    // in the ideal case; allow slack for range-partition boundaries)
    val zX = spans("zord", "x")
    val zY = spans("zord", "y")
    (zX.sum / zX.size) should be < 60.0
    (zY.sum / zY.size) should be < 60.0
    // and the data survived intact
    spark.table("lakehouse.maint_ns.zord").count() shouldBe 10000
    spark.sql("DROP TABLE lakehouse.maint_ns.zlin")
    spark.sql("DROP TABLE lakehouse.maint_ns.zord")
  }

  test("rollback restores an earlier snapshot as a new, history-preserving commit") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.maint_ns")
    spark.sql("CREATE TABLE lakehouse.maint_ns.rb2 (k INT)")
    Seq(1, 2).toDF("k").createOrReplaceTempView("rb2_src")
    spark.sql("INSERT INTO lakehouse.maint_ns.rb2 SELECT * FROM rb2_src") // v2: {1,2}
    Seq(3).toDF("k").createOrReplaceTempView("rb2_src2")
    spark.sql("INSERT INTO lakehouse.maint_ns.rb2 SELECT * FROM rb2_src2") // v3: {1,2,3}
    spark.table("lakehouse.maint_ns.rb2").count() shouldBe 3

    Maintenance.rollback(spark, "lakehouse", Seq("maint_ns"), "rb2", toVersion = 2)
    spark.table("lakehouse.maint_ns.rb2").orderBy($"k").collect()
      .map(_.getInt(0)) shouldBe Array(1, 2)
    // the rollback is itself a commit: v3's state is still reachable...
    spark.sql("SELECT * FROM lakehouse.maint_ns.rb2 VERSION AS OF 3").count() shouldBe 3
    // ...and the rollback can be rolled back
    Maintenance.rollback(spark, "lakehouse", Seq("maint_ns"), "rb2", toVersion = 3)
    spark.table("lakehouse.maint_ns.rb2").count() shouldBe 3
    spark.sql("SELECT * FROM lakehouse.maint_ns.rb2.history ORDER BY version")
      .collect().map(_.getAs[String]("operation")).takeRight(2) shouldBe
      Array("rollback(v2)", "rollback(v3)")
    // vacuuming the current snapshot's complement then rolling back to a
    // vacuumed version must fail clean, not produce a corrupt table
    Maintenance.vacuum(spark, "lakehouse", Seq("maint_ns"), "rb2",
      retainVersions = 1, retentionMs = 0L)
    spark.table("lakehouse.maint_ns.rb2").count() shouldBe 3 // current intact
    spark.sql("DROP TABLE lakehouse.maint_ns.rb2")
  }

  test("renameColumn rewrites data under the new name; time travel keeps the old schema") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.maint_ns")
    spark.sql("CREATE TABLE lakehouse.maint_ns.rn (k INT, v STRING)")
    Seq((1, "a"), (2, "b")).toDF("k", "v").createOrReplaceTempView("rn_src")
    spark.sql("INSERT INTO lakehouse.maint_ns.rn SELECT * FROM rn_src")

    // metadata-only DDL rename must refuse on a non-empty table
    intercept[Exception] {
      spark.sql("ALTER TABLE lakehouse.maint_ns.rn RENAME COLUMN v TO label")
    }

    Maintenance.renameColumn(spark, "lakehouse", Seq("maint_ns"), "rn", "v", "label")
    val t = spark.table("lakehouse.maint_ns.rn")
    t.columns shouldBe Array("k", "label")
    // values survive (a metadata-only rename would read NULLs here)
    t.orderBy($"k").collect().map(_.getString(1)) shouldBe Array("a", "b")
    // the pre-rename snapshot still serves the old schema over old files
    val old = spark.sql("SELECT * FROM lakehouse.maint_ns.rn VERSION AS OF 2")
    old.columns shouldBe Array("k", "v")
    old.orderBy($"k").collect().map(_.getString(1)) shouldBe Array("a", "b")
    spark.sql("SELECT * FROM lakehouse.maint_ns.rn.history ORDER BY version")
      .collect().last.getAs[String]("operation") shouldBe "rename"
    spark.sql("DROP TABLE lakehouse.maint_ns.rn")
  }

  test("renameColumn on a bucketed table preserves the bucket layout, even for the bucket column") {
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.maint_ns")
    spark.sql(
      "CREATE TABLE lakehouse.maint_ns.rb (k INT, v BIGINT) PARTITIONED BY (bucket(4, k))")
    (0 until 20).map(i => (i, i.toLong * 10)).toDF("k", "v")
      .createOrReplaceTempView("rb_src")
    spark.sql("INSERT INTO lakehouse.maint_ns.rb SELECT * FROM rb_src")

    Maintenance.renameColumn(spark, "lakehouse", Seq("maint_ns"), "rb", "k", "key")
    val t = spark.table("lakehouse.maint_ns.rb")
    t.columns shouldBe Array("key", "v")
    t.count() shouldBe 20
    // bucket spec followed the rename and every live file is bucket-addressable
    val lt = spark.sessionState.catalogManager.catalog("lakehouse")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("maint_ns"), "rb"))
      .asInstanceOf[graft.catalog.LakehouseTable]
    graft.catalog.Bucketing.specOf(lt.meta.properties) shouldBe Some(("key", 4))
    lt.meta.files.forall(f =>
      graft.catalog.Bucketing.bucketIdOf(f).exists(_ < 4)) shouldBe true
    spark.sql("DROP TABLE lakehouse.maint_ns.rb")
  }

  test("4-column zorder clusters every dimension and survives empty/all-null input") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.maint_ns")
    spark.sql("CREATE TABLE lakehouse.maint_ns.z4 (a INT, b INT, c INT, d INT)")
    val rows = for { a <- 0 until 8; b <- 0 until 8; c <- 0 until 8; d <- 0 until 8 }
      yield (a * 13, b * 13, c * 13, d * 13)
    rows.toDF("a", "b", "c", "d").createOrReplaceTempView("z4_src")
    spark.sql("INSERT INTO lakehouse.maint_ns.z4 SELECT * FROM z4_src")
    // 4 dims × 16 bits would put the top plane on the long's sign bit
    // (15*4+3 = 63) and break the keyspace order for the 4th dimension
    Maintenance.compact(spark, "lakehouse", Seq("maint_ns"), "z4",
      targetFiles = 16, clusterBy = Seq("a", "b", "c", "d"), zorder = true)
    spark.table("lakehouse.maint_ns.z4").count() shouldBe 4096
    val lt = spark.sessionState.catalogManager.catalog("lakehouse")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("maint_ns"), "z4"))
      .asInstanceOf[graft.catalog.LakehouseTable]
    Seq("a", "b", "c", "d").foreach { c =>
      val spans = lt.meta.files.flatMap(f => lt.meta.fileStats.get(f))
        .flatMap(_.get(c)).map(r => r.max.toDouble - r.min.toDouble)
      (spans.sum / spans.size) should be < 70.0 // domain is 0..91
    }
    spark.sql("DROP TABLE lakehouse.maint_ns.z4")

    // empty table: the bounds row is all-null — must not NPE
    spark.sql("CREATE TABLE lakehouse.maint_ns.z4e (a INT, b INT)")
    noException should be thrownBy Maintenance.compact(spark, "lakehouse",
      Seq("maint_ns"), "z4e", targetFiles = 2, clusterBy = Seq("a", "b"), zorder = true)
    spark.sql("DROP TABLE lakehouse.maint_ns.z4e")

    // all-null cluster column: that dimension degrades to a constant
    spark.sql("CREATE TABLE lakehouse.maint_ns.z4n (a INT, b INT)")
    Seq((1, Option.empty[Int]), (2, Option.empty[Int]), (3, Option.empty[Int]))
      .toDF("a", "b").createOrReplaceTempView("z4n_src")
    spark.sql("INSERT INTO lakehouse.maint_ns.z4n SELECT * FROM z4n_src")
    Maintenance.compact(spark, "lakehouse", Seq("maint_ns"), "z4n",
      targetFiles = 1, clusterBy = Seq("a", "b"), zorder = true)
    spark.table("lakehouse.maint_ns.z4n").count() shouldBe 3
    spark.sql("DROP TABLE lakehouse.maint_ns.z4n")
  }

  test("compactWhere rewrites only the targeted partition's files") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.maint_ns")
    spark.sql("CREATE TABLE lakehouse.maint_ns.cw (k INT, v INT) PARTITIONED BY (k)")
    // three small commits per partition value → 3 files each
    (0 until 3).foreach { c =>
      (0 until 2).foreach { k =>
        (0 until 20).map(i => (k, c * 100 + i)).toDF("k", "v").coalesce(1)
          .createOrReplaceTempView("cw_src")
        spark.sql("INSERT INTO lakehouse.maint_ns.cw SELECT * FROM cw_src")
      }
    }
    def files(): Seq[String] = spark.sessionState.catalogManager.catalog("lakehouse")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("maint_ns"), "cw"))
      .asInstanceOf[graft.catalog.LakehouseTable].meta.files
    val beforeFiles = files()
    beforeFiles.size shouldBe 6

    spark.sql("CALL lakehouse.system.compact_where('maint_ns', 'cw', 'k', '0')")
      .collect()(0).getLong(0) shouldBe 3L
    val afterFiles = files()
    afterFiles.size shouldBe 4 // k=0 compacted to 1, k=1's 3 carried
    // the untouched partition's files carried BY REFERENCE (same paths)
    spark.table("lakehouse.maint_ns.cw").where($"k" === 0).count() shouldBe 60
    spark.table("lakehouse.maint_ns.cw").where($"k" === 1).count() shouldBe 60
    (beforeFiles.toSet intersect afterFiles.toSet).size shouldBe 3 // k=1's files
    spark.sql("DROP TABLE lakehouse.maint_ns.cw")
  }

  test("metadata-only commits (analyze) pass through incremental windows") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.maint_ns")
    spark.sql("CREATE TABLE lakehouse.maint_ns.inc (k INT)") // v1
    Seq(1).toDF("k").createOrReplaceTempView("inc_src")
    spark.sql("INSERT INTO lakehouse.maint_ns.inc SELECT * FROM inc_src") // v2
    graft.catalog.TableStats.analyze(
      spark, "lakehouse", Seq("maint_ns"), "inc") shouldBe 1L // v3: no file changes
    Seq(2).toDF("k").createOrReplaceTempView("inc_src2")
    spark.sql("INSERT INTO lakehouse.maint_ns.inc SELECT * FROM inc_src2") // v4
    // the window spans the analyze commit: the added-file diff is still
    // exact, so it must not be rejected as a rewrite
    Maintenance.changesBetween(spark, "lakehouse", Seq("maint_ns"), "inc", 1, 4)
      .collect().map(_.getInt(0)).sorted shouldBe Array(1, 2)
    // a genuinely file-dropping commit still fails
    spark.sql("DELETE FROM lakehouse.maint_ns.inc WHERE k = 1") // v5
    intercept[IllegalArgumentException] {
      Maintenance.changesBetween(spark, "lakehouse", Seq("maint_ns"), "inc", 1, 5)
    }.getMessage should include("non-append")
    spark.sql("DROP TABLE lakehouse.maint_ns.inc")
  }

  test("expireSnapshots bounds the metadata log; expired versions fail cleanly") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.maint_ns")
    spark.sql("CREATE TABLE lakehouse.maint_ns.exp (k INT)") // v1
    (1 to 4).foreach { i => // v2..v5
      Seq(i).toDF("k").createOrReplaceTempView("exp_src")
      spark.sql("INSERT INTO lakehouse.maint_ns.exp SELECT * FROM exp_src")
    }
    spark.sql("SELECT * FROM lakehouse.maint_ns.exp VERSION AS OF 2").count() shouldBe 1

    spark.sql("CALL lakehouse.system.expire_snapshots('maint_ns', 'exp', 2)")
      .collect()(0).getLong(0) shouldBe 3L // v1..v3 expired, v4..v5 retained

    // current reads unaffected; retained time travel works
    spark.table("lakehouse.maint_ns.exp").count() shouldBe 4
    spark.sql("SELECT * FROM lakehouse.maint_ns.exp VERSION AS OF 4").count() shouldBe 3
    // expired version: clean error, not a wrong answer
    intercept[Exception] {
      spark.sql("SELECT * FROM lakehouse.maint_ns.exp VERSION AS OF 2").count()
    }.getMessage should include("version")
    // metadata_log_entries lists only retained (loadable) versions;
    // history keeps the full lightweight summary lineage
    spark.sql(
      "SELECT version FROM lakehouse.maint_ns.exp.metadata_log_entries ORDER BY version")
      .collect().map(_.getInt(0)) shouldBe Array(4, 5)
    spark.sql("SELECT version FROM lakehouse.maint_ns.exp.history ORDER BY version")
      .collect().map(_.getInt(0)) shouldBe Array(1, 2, 3, 4, 5)

    // incremental reads: valid retained window works, expired window errors
    Maintenance.changesBetween(spark, "lakehouse", Seq("maint_ns"), "exp", 4, 5)
      .collect().map(_.getInt(0)) shouldBe Array(4)
    intercept[IllegalArgumentException] {
      Maintenance.changesBetween(spark, "lakehouse", Seq("maint_ns"), "exp", 1, 5)
    }.getMessage should include("expired")
    intercept[IllegalArgumentException] {
      Maintenance.changesBetween(spark, "lakehouse", Seq("maint_ns"), "exp", 3, 5)
    }.getMessage should include("expired")
    spark.sql("DROP TABLE lakehouse.maint_ns.exp")
  }

  test("procedures bind their catalog per load, not via shared mutable state") {
    import org.apache.spark.sql.connector.catalog.Identifier
    import org.apache.spark.sql.connector.catalog.procedures.BoundProcedure
    import org.apache.spark.unsafe.types.UTF8String

    // second LakehouseCatalog registration over its own warehouse
    val wh2 = java.nio.file.Files.createTempDirectory("graft-wh2-").toString
    spark.conf.set("spark.sql.catalog.lake2", "graft.catalog.LakehouseCatalog")
    spark.conf.set("spark.sql.catalog.lake2.warehouse", wh2)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.maint_ns")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake2.maint_ns")
    spark.sql("CREATE TABLE lakehouse.maint_ns.pp (k INT)")
    spark.sql("CREATE TABLE lake2.maint_ns.pp (k INT)")
    (0 until 3).foreach { i =>
      Seq(i).toDF("k").createOrReplaceTempView("pp_src")
      spark.sql("INSERT INTO lakehouse.maint_ns.pp SELECT * FROM pp_src")
      spark.sql("INSERT INTO lake2.maint_ns.pp SELECT * FROM pp_src")
    }
    def fileCount(cat: String): Int = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(Identifier.of(Array("maint_ns"), "pp"))
      .asInstanceOf[graft.catalog.LakehouseTable].meta.files.size
    fileCount("lakehouse") shouldBe 3
    fileCount("lake2") shouldBe 3

    val id = Identifier.of(Array("system"), "compact")
    val p1 = graft.catalog.LakehouseProcedures.load(id, "lakehouse").get
    val p2 = graft.catalog.LakehouseProcedures.load(id, "lake2").get // after p1: must not clobber it
    (p1 ne p2) shouldBe true
    val args = org.apache.spark.sql.catalyst.InternalRow(
      UTF8String.fromString("maint_ns"), UTF8String.fromString("pp"),
      1, UTF8String.fromString(""), false)
    p1.asInstanceOf[BoundProcedure].call(args.copy()) // compacts LAKEHOUSE's pp
    fileCount("lakehouse") shouldBe 1
    fileCount("lake2") shouldBe 3 // untouched

    // the SQL CALL surface still works end-to-end
    spark.sql("CALL lake2.system.compact('maint_ns', 'pp')").collect()(0)
      .getLong(0) shouldBe 1L
    fileCount("lake2") shouldBe 1
    spark.sql("DROP TABLE lakehouse.maint_ns.pp")
    spark.sql("DROP TABLE lake2.maint_ns.pp")
  }
}
