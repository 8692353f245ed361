package graft

import org.apache.spark.sql.catalyst.plans.LeftAnti
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.catalog.{Maintenance, MergeOnRead, TableMetadata}

/** Merge-on-read equality deletes: write-cheap row deletion (no data
  * file touched), transparent merged reads via the MorReads rule,
  * sequence semantics, materialization, and the guard rails around
  * every consumer that assumed files == rows. */
class MorSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def files(t: String): Seq[String] =
    spark.sql(s"SELECT file_path FROM $t.files").collect().map(_.getString(0)).toSeq

  private def tableDir(name: String): java.nio.file.Path =
    spark.sessionState.catalogManager.catalog("lakehouse")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(Array("mor_ns"), name))
      .asInstanceOf[graft.catalog.LakehouseTable].tableDir

  private def antiJoins(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case j: Join if j.joinType == LeftAnti => j
    }.size

  /** Three append commits with DISJOINT key ranges → three files whose
    * stats make cleanliness provable. */
  private def threeCommits(tbl: String): Unit = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.mor_ns")
    spark.sql(s"CREATE TABLE $tbl (k INT, v STRING) PARTITIONED BY (k)")
    (0 until 3).foreach { c =>
      (0 until 100).map(i => (c * 100 + i, s"v$c-$i")).toDF("k", "v")
        .createOrReplaceTempView("mor_src")
      spark.sql(s"INSERT INTO $tbl SELECT * FROM mor_src")
    }
  }

  test("morDelete removes rows without touching a data file; clean files skip the join") {
    val t = "lakehouse.mor_ns.m1"
    threeCommits(t)
    val before = files(t)
    spark.table(t).count() shouldBe 300

    // delete 10 keys, all inside commit 1's range [100, 200)
    val n = MergeOnRead.morDelete(spark, "lakehouse", Seq("mor_ns"), "m1",
      (110 until 120).toDF("k"))
    n shouldBe 10

    // not one data file changed — the commit wrote only a key parquet
    files(t) should contain theSameElementsAs before
    spark.sql(s"SELECT * FROM $t.delete_files").count() shouldBe 1

    // reads merge: rows gone, everything else intact
    spark.table(t).count() shouldBe 290
    spark.table(t).where($"k" >= 110 && $"k" < 120).count() shouldBe 0
    spark.table(t).where($"k" === 109).count() shouldBe 1

    // plan shape: exactly ONE anti-join branch — the two clean files'
    // key ranges are disjoint from the delete keys, so they stream plain
    antiJoins(spark.table(t)) shouldBe 1

    // filters compose with the merge
    spark.sql(s"SELECT count(*) FROM $t WHERE k < 150").collect()(0).getLong(0) shouldBe 140
    spark.sql(s"DROP TABLE $t")
  }

  test("merged reads survive a Dataset temp view + INSERT re-analysis") {
    // regression (round 9): ViewHelper.prepareTemporaryViewPlan
    // normalizes NAMED DSv2 relations into V2TableReference (name +
    // options only); re-resolution reloads the full current table.
    // MorReads' file-subset sub-relations used to carry the table's
    // name, so a dirty table read through `df.createOrReplaceTempView`
    // + `INSERT INTO … SELECT` rescanned ALL files per union branch
    // with the plain-read marker still set: deleted rows resurrected
    // and every row duplicated per branch. Sub-relations are anonymous
    // now — the view stores them verbatim.
    val t = "lakehouse.mor_ns.mview"
    threeCommits(t)
    MergeOnRead.morDelete(spark, "lakehouse", Seq("mor_ns"), "mview",
      (110 until 120).toDF("k"))

    val derived = spark.table(t).groupBy($"k").count()
    derived.createOrReplaceTempView("mor_view_src")
    // SQL reference through the view: same rows as direct execution
    spark.sql("SELECT * FROM mor_view_src").count() shouldBe 290
    spark.sql("SELECT max(count) FROM mor_view_src").collect()(0).getLong(0) shouldBe 1L

    // and through a write command's re-analysis (the TextIndex.create
    // shape that exposed it): no resurrection, no duplication
    spark.sql("CREATE TABLE lakehouse.mor_ns.mview_out (k INT, count BIGINT)")
    spark.sql("INSERT INTO lakehouse.mor_ns.mview_out SELECT k, count FROM mor_view_src")
    val out = spark.table("lakehouse.mor_ns.mview_out")
    out.count() shouldBe 290
    out.where($"k" >= 110 && $"k" < 120).count() shouldBe 0
    out.groupBy($"k").count().where($"count" > 1).count() shouldBe 0
    spark.sql(s"DROP TABLE $t")
    spark.sql("DROP TABLE lakehouse.mor_ns.mview_out")
  }

  test("sequence semantics: rows re-inserted after the delete survive it") {
    val t = "lakehouse.mor_ns.m2"
    threeCommits(t)
    MergeOnRead.morDelete(spark, "lakehouse", Seq("mor_ns"), "m2", Seq(42, 43).toDF("k"))
    spark.table(t).where($"k" === 42).count() shouldBe 0

    Seq((42, "reborn")).toDF("k", "v").createOrReplaceTempView("mor_re")
    spark.sql(s"INSERT INTO $t SELECT * FROM mor_re")
    val rows = spark.table(t).where($"k" === 42).collect()
    rows should have length 1
    rows.head.getString(1) shouldBe "reborn"
    spark.table(t).where($"k" === 43).count() shouldBe 0 // still dead
    spark.sql(s"DROP TABLE $t")
  }

  test("time travel: pre-delete versions see the rows, post-delete versions do not") {
    val t = "lakehouse.mor_ns.m3"
    threeCommits(t)
    val preV = spark.sql(s"SELECT MAX(version) FROM $t.history").collect()(0).getInt(0)
    MergeOnRead.morDelete(spark, "lakehouse", Seq("mor_ns"), "m3", Seq(7).toDF("k"))
    spark.sql(s"SELECT * FROM $t VERSION AS OF $preV").count() shouldBe 300
    spark.table(t).count() shouldBe 299

    // rollback restores the pre-delete state (and is itself a commit)
    Maintenance.rollback(spark, "lakehouse", Seq("mor_ns"), "m3", preV)
    spark.table(t).count() shouldBe 300
    spark.sql(s"DROP TABLE $t")
  }

  test("materializeDeletes rewrites only dirty files, carries the rest, clears entries") {
    val t = "lakehouse.mor_ns.m4"
    threeCommits(t)
    MergeOnRead.morDelete(spark, "lakehouse", Seq("mor_ns"), "m4",
      (110 until 120).toDF("k"))
    val before = files(t)

    MergeOnRead.materializeDeletes(spark, "lakehouse", Seq("mor_ns"), "m4") shouldBe 1

    val after = files(t)
    // two clean files carried by reference, one dirty file rewritten
    (after.toSet intersect before.toSet).size shouldBe 2
    after.exists(_.contains("-materialize-")) shouldBe true
    spark.sql(s"SELECT * FROM $t.delete_files").count() shouldBe 0
    spark.table(t).count() shouldBe 290
    antiJoins(spark.table(t)) shouldBe 0 // join-free again
    spark.sql(s"DROP TABLE $t")
  }

  test("compact folds pending deletes in and clears the entries") {
    val t = "lakehouse.mor_ns.m5"
    threeCommits(t)
    MergeOnRead.morDelete(spark, "lakehouse", Seq("mor_ns"), "m5", Seq(5, 105, 205).toDF("k"))
    Maintenance.compact(spark, "lakehouse", Seq("mor_ns"), "m5", targetFiles = 1)
    spark.table(t).count() shouldBe 297
    spark.sql(s"SELECT * FROM $t.delete_files").count() shouldBe 0
    spark.table(t).where($"k".isin(5, 105, 205)).count() shouldBe 0
    spark.sql(s"DROP TABLE $t")
  }

  test("COW DELETE and updateWhere on a dirty table never resurrect MoR-deleted rows") {
    val t = "lakehouse.mor_ns.m6"
    threeCommits(t)
    MergeOnRead.morDelete(spark, "lakehouse", Seq("mor_ns"), "m6",
      (110 until 120).toDF("k"))

    // COW DELETE rewrites commit-1's file (its range covers k=150):
    // the rewrite must not write the MoR-deleted keys back
    spark.sql(s"DELETE FROM $t WHERE k = 150")
    spark.table(t).count() shouldBe 289
    spark.table(t).where($"k" === 115).count() shouldBe 0

    // updateWhere rewrites the same file again
    Maintenance.updateWhere(spark, "lakehouse", Seq("mor_ns"), "m6",
      org.apache.spark.sql.functions.col("k") === 151,
      Map("v" -> org.apache.spark.sql.functions.lit("patched")))
    spark.table(t).where($"k" === 151).collect().head.getString(1) shouldBe "patched"
    spark.table(t).where($"k" === 115).count() shouldBe 0
    spark.table(t).count() shouldBe 289
    spark.sql(s"DROP TABLE $t")
  }

  test("morUpsert replaces current key versions and appends, one commit, no rewrite") {
    val t = "lakehouse.mor_ns.m7"
    threeCommits(t)
    val dataBefore = files(t)
    val n = MergeOnRead.morUpsert(spark, "lakehouse", Seq("mor_ns"), "m7",
      Seq((50, "updated"), (999, "new")).toDF("k", "v"), Seq("k"))
    n shouldBe 2

    // one commit: old data files untouched, one new file, one entry
    (files(t).toSet intersect dataBefore.toSet).size shouldBe dataBefore.size
    files(t).size shouldBe dataBefore.size + 1
    spark.sql(s"SELECT * FROM $t.delete_files").count() shouldBe 1

    spark.table(t).count() shouldBe 301 // 300 - 1 replaced + 2
    spark.table(t).where($"k" === 50).collect().map(_.getString(1)) shouldBe Array("updated")
    spark.table(t).where($"k" === 999).count() shouldBe 1
    spark.sql(s"DROP TABLE $t")
  }

  test("changelog emits the MoR-deleted rows at their commit; compaction emits nothing") {
    val t = "lakehouse.mor_ns.m8"
    threeCommits(t)
    MergeOnRead.morDelete(spark, "lakehouse", Seq("mor_ns"), "m8", Seq(1, 2).toDF("k"))
    val delV = spark.sql(s"SELECT MAX(version) FROM $t.history").collect()(0).getInt(0)

    val cdc = Maintenance.changelogBetween(
      spark, "lakehouse", Seq("mor_ns"), "m8", delV - 1, delV)
      .orderBy("k").collect()
    cdc.map(r => (r.getInt(0), r.getString(2), r.getInt(3))) shouldBe
      Array((1, "delete", delV), (2, "delete", delV))

    // materialization is a physical no-op for the changelog
    MergeOnRead.materializeDeletes(spark, "lakehouse", Seq("mor_ns"), "m8")
    val matV = delV + 1
    Maintenance.changelogBetween(
      spark, "lakehouse", Seq("mor_ns"), "m8", delV, matV).count() shouldBe 0
    spark.sql(s"DROP TABLE $t")
  }

  test("metadata-only COUNT and LIMIT truncation stand down while deletes are pending") {
    val t = "lakehouse.mor_ns.m9"
    threeCommits(t)
    MergeOnRead.morDelete(spark, "lakehouse", Seq("mor_ns"), "m9",
      (0 until 50).toDF("k"))
    // the stale metadata answer would be 300
    spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0) shouldBe 250
    spark.sql(s"SELECT count(*) FROM $t").queryExecution.executedPlan.toString should
      not include "GraftMetadataAggregate"
    // a LIMIT over more rows than any one file: recorded-count
    // truncation would under-return
    spark.sql(s"SELECT * FROM $t LIMIT 260").count() shouldBe 250
    spark.sql(s"DROP TABLE $t")
  }

  test("SQL MERGE/UPDATE refuse dirty tables with a pointer to materialization") {
    val t = "lakehouse.mor_ns.m10"
    threeCommits(t)
    MergeOnRead.morDelete(spark, "lakehouse", Seq("mor_ns"), "m10", Seq(1).toDF("k"))
    val e = intercept[Exception] {
      spark.sql(s"UPDATE $t SET v = 'x' WHERE k = 2").collect()
    }
    e.getMessage should include("materialize")
    // after materializing, the same UPDATE works
    MergeOnRead.materializeDeletes(spark, "lakehouse", Seq("mor_ns"), "m10")
    spark.sql(s"UPDATE $t SET v = 'x' WHERE k = 2")
    spark.table(t).where($"k" === 2).collect().head.getString(1) shouldBe "x"
    spark.sql(s"DROP TABLE $t")
  }

  test("CALL system.mor_delete and system.materialize_deletes round-trip") {
    val t = "lakehouse.mor_ns.m11"
    threeCommits(t)
    Seq(3, 4).toDF("k").createOrReplaceTempView("mor_kill")
    val killed = spark.sql(
      s"CALL lakehouse.system.mor_delete('mor_ns', 'm11', 'mor_kill')")
      .collect()(0).getLong(0)
    killed shouldBe 2
    spark.table(t).count() shouldBe 298
    spark.sql(s"CALL lakehouse.system.materialize_deletes('mor_ns', 'm11')")
      .collect()(0).getLong(0) shouldBe 1
    spark.table(t).count() shouldBe 298
    spark.sql(s"SELECT * FROM $t.delete_files").count() shouldBe 0
    spark.sql(s"DROP TABLE $t")
  }

  test("streams fail on a mor-delete commit instead of silently keeping emitted rows") {
    val t = "lakehouse.mor_ns.m12"
    threeCommits(t)
    MergeOnRead.morDelete(spark, "lakehouse", Seq("mor_ns"), "m12", Seq(1).toDF("k"))
    val ckpt = java.nio.file.Files.createTempDirectory("mor-ckpt-").toString
    val q = spark.readStream.table(t).writeStream
      .format("memory").queryName("mor_stream")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    val e = intercept[Exception] { q.awaitTermination() }
    var cause: Throwable = e
    while (cause.getCause != null && !cause.getMessage.contains("merge-on-read"))
      cause = cause.getCause
    cause.getMessage should include("merge-on-read")
    spark.sql(s"DROP TABLE $t")
  }

  test("changesBetween refuses windows containing mor-delete commits") {
    val t = "lakehouse.mor_ns.m13"
    threeCommits(t)
    MergeOnRead.morDelete(spark, "lakehouse", Seq("mor_ns"), "m13", Seq(1).toDF("k"))
    val v = spark.sql(s"SELECT MAX(version) FROM $t.history").collect()(0).getInt(0)
    val e = intercept[IllegalArgumentException] {
      Maintenance.changesBetween(spark, "lakehouse", Seq("mor_ns"), "m13", 1, v)
    }
    e.getMessage should include("merge-on-read")
    spark.sql(s"DROP TABLE $t")
  }

  test("vacuum keeps delete parquets of retained versions, collects them after materialize") {
    val t = "lakehouse.mor_ns.m14"
    threeCommits(t)
    MergeOnRead.morDelete(spark, "lakehouse", Seq("mor_ns"), "m14", Seq(1).toDF("k"))
    val dir = tableDir("m14")
    def deleteParquets(): Seq[java.nio.file.Path] = {
      val d = dir.resolve("deletes")
      if (!java.nio.file.Files.isDirectory(d)) Nil
      else {
        val s = java.nio.file.Files.walk(d)
        try {
          val it = s.iterator()
          val buf = scala.collection.mutable.Buffer[java.nio.file.Path]()
          while (it.hasNext) { val p = it.next(); if (p.toString.endsWith(".parquet")) buf += p }
          buf.toSeq
        } finally s.close()
      }
    }
    deleteParquets() should have size 1
    // current version references the entry: vacuum must keep it
    Maintenance.vacuum(spark, "lakehouse", Seq("mor_ns"), "m14",
      retainVersions = 1, retentionMs = 0L)
    deleteParquets() should have size 1
    spark.table(t).count() shouldBe 299
    // after materialization nothing references it: collected
    MergeOnRead.materializeDeletes(spark, "lakehouse", Seq("mor_ns"), "m14")
    Maintenance.vacuum(spark, "lakehouse", Seq("mor_ns"), "m14",
      retainVersions = 1, retentionMs = 0L)
    deleteParquets() shouldBe empty
    spark.table(t).count() shouldBe 299
    spark.sql(s"DROP TABLE $t")
  }

  test("SQL DELETE in merge-on-read mode commits keys, not rewrites") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.mor_ns")
    spark.sql("CREATE TABLE lakehouse.mor_ns.sqlmor (k INT, v STRING) PARTITIONED BY (k) " +
      "TBLPROPERTIES ('graft.delete.mode'='merge-on-read')")
    (0 until 3).foreach { c =>
      (0 until 100).map(i => (c * 100 + i, s"v$c-$i")).toDF("k", "v")
        .createOrReplaceTempView("mor_src")
      spark.sql("INSERT INTO lakehouse.mor_ns.sqlmor SELECT * FROM mor_src")
    }
    val before = files("lakehouse.mor_ns.sqlmor")

    spark.sql("DELETE FROM lakehouse.mor_ns.sqlmor WHERE k >= 110 AND k < 120")
    // no data file rewritten — the delete is an equality-delete commit
    files("lakehouse.mor_ns.sqlmor") should contain theSameElementsAs before
    spark.sql("SELECT * FROM lakehouse.mor_ns.sqlmor.delete_files").count() shouldBe 1
    spark.table("lakehouse.mor_ns.sqlmor").count() shouldBe 290
    spark.table("lakehouse.mor_ns.sqlmor").where($"k" === 115).count() shouldBe 0
    spark.sql("SELECT operation FROM lakehouse.mor_ns.sqlmor.history ORDER BY version")
      .collect().last.getString(0) shouldBe "mor-delete"

    // a DELETE matching nothing publishes nothing
    val v = spark.sql("SELECT MAX(version) FROM lakehouse.mor_ns.sqlmor.history")
      .collect()(0).getInt(0)
    spark.sql("DELETE FROM lakehouse.mor_ns.sqlmor WHERE k = 99999")
    spark.sql("SELECT MAX(version) FROM lakehouse.mor_ns.sqlmor.history")
      .collect()(0).getInt(0) shouldBe v

    // with a declared key, the delete file records just the key column
    spark.sql("ALTER TABLE lakehouse.mor_ns.sqlmor SET TBLPROPERTIES ('graft.key'='k')")
    spark.sql("DELETE FROM lakehouse.mor_ns.sqlmor WHERE v = 'v2-5'")
    spark.table("lakehouse.mor_ns.sqlmor").count() shouldBe 289
    val keyCols = spark.sql(
      "SELECT key_columns FROM lakehouse.mor_ns.sqlmor.delete_files ORDER BY sequence")
      .collect().map(_.getString(0))
    keyCols.last shouldBe "k"
    spark.sql("DROP TABLE lakehouse.mor_ns.sqlmor")
  }

  test("zero-match merge-on-read DELETE is a clean no-op, not a crash") {
    // Regression: the zero-match cleanup used to delete only *.parquet
    // from the staging dir then Files.deleteIfExists the dir itself,
    // which still held the committer's _SUCCESS/.crc artifacts →
    // DirectoryNotEmptyException on an ordinary no-op DELETE.
    val t = "lakehouse.mor_ns.mz"
    threeCommits(t)

    // direct: an empty key frame commits nothing and returns 0
    MergeOnRead.morDelete(spark, "lakehouse", Seq("mor_ns"), "mz",
      Seq.empty[Int].toDF("k")) shouldBe 0
    spark.sql(s"SELECT * FROM $t.delete_files").count() shouldBe 0
    spark.table(t).count() shouldBe 300

    // SQL path: per-column ranges overlap (k=50 inside file 0, v
    // between its min/max) but the joint match is empty, so candidates
    // survive stats pruning and the key scan yields zero rows
    spark.sql("ALTER TABLE lakehouse.mor_ns.mz SET TBLPROPERTIES " +
      "('graft.delete.mode'='merge-on-read')")
    val v = spark.sql(s"SELECT MAX(version) FROM $t.history").collect()(0).getInt(0)
    spark.sql(s"DELETE FROM $t WHERE k = 50 AND v = 'v0-5x'")
    spark.sql(s"SELECT MAX(version) FROM $t.history").collect()(0).getInt(0) shouldBe v
    spark.sql(s"SELECT * FROM $t.delete_files").count() shouldBe 0
    spark.table(t).count() shouldBe 300

    // no staging leftovers under deletes/
    val dir = tableDir("mz").resolve("deletes")
    (!java.nio.file.Files.isDirectory(dir) ||
      !java.nio.file.Files.list(dir).iterator().hasNext) shouldBe true
    spark.sql(s"DROP TABLE $t")
  }

  test("plan shape: broadcast anti-join, pushdown and pruning reach the dirty branch") {
    val t = "lakehouse.mor_ns.mplan"
    threeCommits(t)
    MergeOnRead.morDelete(spark, "lakehouse", Seq("mor_ns"), "mplan",
      (110 until 120).toDF("k"))

    // the delete-key side is tiny → Spark must broadcast it (final
    // AQE plan, so run the query first)
    val dirty = spark.table(t)
    dirty.collect()
    // expand AQE wrappers: AdaptiveSparkPlanExec and QueryStageExec are
    // leaves whose real plan hangs off a field, not children
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] =
      p +: (p.children ++ (p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(s.plan)
        case _ => Nil
      })).flatMap(allNodes)
    val nodes = allNodes(dirty.queryExecution.executedPlan)
    val bj = nodes.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
          if j.joinType == LeftAnti => j
    }
    bj should have size 1

    // a filter on the table still prunes files inside the rewritten
    // branches (stats skipping survives the rewrite)
    spark.table(t).where($"k" === 5).count() shouldBe 1
    val (surv, total) = graft.catalog.LakehouseTable.lastScanFileCounts.get()
    total should be >= 1
    surv should be < 3 // two of the three files' ranges exclude k=5

    // column pruning reaches the parquet scan: a v-only projection must
    // not read k... except as the anti-join key on the dirty branch —
    // the clean branch must read v alone
    val df = spark.table(t).select("v")
    df.collect()
    val scans = allNodes(df.queryExecution.executedPlan).collect {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => s
    }
    scans.nonEmpty shouldBe true
    val cleanSchemas = scans.map(_.scan.readSchema().fieldNames.toSet)
    cleanSchemas should contain(Set("v")) // at least one branch reads v only
    spark.sql(s"DROP TABLE $t")
  }

  test("positional DELETE commits (file, pos) entries; clean files skip the join") {
    val t = "lakehouse.mor_ns.pos1"
    threeCommits(t)
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES " +
      "('graft.delete.mode'='merge-on-read-positional')")
    val before = files(t)

    // delete by a NON-key-addressable predicate (v is not a key): the
    // equality shape would have to ship whole-row tuples; positional
    // records (file, offset) pairs instead
    spark.sql(s"DELETE FROM $t WHERE k >= 110 AND k < 120")
    files(t) should contain theSameElementsAs before // zero data files touched
    val entries = spark.sql(s"SELECT key_columns, kind FROM $t.delete_files").collect()
    entries should have length 1
    entries.head.getString(0) shouldBe "file,pos"
    entries.head.getString(1) shouldBe "positional"

    spark.table(t).count() shouldBe 290
    spark.table(t).where($"k" === 115).count() shouldBe 0
    spark.table(t).where($"k" === 109).count() shouldBe 1
    // only the one targeted file pays the anti-join; the entry's file
    // range proves the other two clean
    antiJoins(spark.table(t)) shouldBe 1
    // filters compose with the merge
    spark.sql(s"SELECT count(*) FROM $t WHERE k < 150").collect()(0).getLong(0) shouldBe 140

    // rows (re)inserted after the positional delete are untouched even
    // though their k values repeat deleted ones
    Seq((115, "reborn")).toDF("k", "v").createOrReplaceTempView("pos_re")
    spark.sql(s"INSERT INTO $t SELECT * FROM pos_re")
    spark.table(t).where($"k" === 115).collect().map(_.getString(1)) shouldBe Array("reborn")

    // zero-match DELETE publishes nothing (and does not crash)
    val v = spark.sql(s"SELECT MAX(version) FROM $t.history").collect()(0).getInt(0)
    spark.sql(s"DELETE FROM $t WHERE k = 77777")
    spark.sql(s"SELECT MAX(version) FROM $t.history").collect()(0).getInt(0) shouldBe v
    spark.sql(s"DROP TABLE $t")
  }

  test("delete sets past the single-file ceiling fan out to multi-file entries, same results") {
    val t = "lakehouse.mor_ns.fan1"
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.mor_ns")
    spark.sql(s"CREATE TABLE $t (k INT, v STRING)")
    // ONE data file, so every fan-out entry applies to the same file
    // group and the single-union-join claim is observable in the plan
    spark.range(100).selectExpr("CAST(id AS INT) AS k", "CAST(id AS STRING) AS v")
      .coalesce(1).createOrReplaceTempView("fan_src")
    spark.sql(s"INSERT INTO $t SELECT * FROM fan_src")
    files(t) should have length 1
    // force the fan-out path at test scale: cap a delete parquet at 10
    // tuples so a 40-key delete writes range-partitioned files
    spark.conf.set("graft.mor.maxSingleFileDeleteTuples", "10")
    try {
      MergeOnRead.morDelete(spark, "lakehouse", Seq("mor_ns"), "fan1",
        (30 until 70).toDF("k")) shouldBe 40
      val eqEntries = spark.sql(s"SELECT file_path, kind FROM $t.delete_files").collect()
      eqEntries.length should be >= 2 // fanned out, every file registered
      eqEntries.foreach(_.getString(1) shouldBe "equality")
      spark.table(t).count() shouldBe 60
      spark.table(t).where($"k" >= 30 && $"k" < 70).count() shouldBe 0
      spark.table(t).where($"k" === 29).count() shouldBe 1
      // same-commit fan-out entries anti-join ONCE (one union scan of
      // the entry files), not once per delete file
      antiJoins(spark.table(t)) shouldBe 1

      // positional fan-out: a non-key-addressable predicate DELETE
      spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES " +
        "('graft.delete.mode'='merge-on-read-positional')")
      spark.sql(s"DELETE FROM $t WHERE k >= 70 AND k < 95")
      val posEntries = spark.sql(
        s"SELECT file_path FROM $t.delete_files WHERE kind = 'positional'").collect()
      posEntries.length should be >= 2
      spark.table(t).count() shouldBe 35
      spark.table(t).where($"k" === 80).count() shouldBe 0
      spark.table(t).where($"k" === 95).count() shouldBe 1
      // one union join per (commit, shape): equality commit + positional commit
      antiJoins(spark.table(t)) shouldBe 2
      // materialization folds the multi-file entries in like any other
      MergeOnRead.materializeDeletes(spark, "lakehouse", Seq("mor_ns"), "fan1")
      spark.sql(s"SELECT * FROM $t.delete_files").count() shouldBe 0
      spark.table(t).count() shouldBe 35
      antiJoins(spark.table(t)) shouldBe 0
    } finally spark.conf.unset("graft.mor.maxSingleFileDeleteTuples")
    spark.sql(s"DROP TABLE $t")
  }

  test("positional and equality entries compose; materialization folds both in") {
    val t = "lakehouse.mor_ns.pos2"
    threeCommits(t)
    // equality delete of commit-0 keys
    MergeOnRead.morDelete(spark, "lakehouse", Seq("mor_ns"), "pos2",
      (0 until 10).toDF("k"))
    // positional delete of commit-1 rows by predicate
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES " +
      "('graft.delete.mode'='merge-on-read-positional')")
    spark.sql(s"DELETE FROM $t WHERE v = 'v1-50'")
    spark.table(t).count() shouldBe 289
    spark.table(t).where($"k" === 5).count() shouldBe 0
    spark.table(t).where($"v" === "v1-50").count() shouldBe 0
    spark.sql(s"SELECT * FROM $t.delete_files").count() shouldBe 2

    // a positional delete over rows ALREADY equality-deleted records
    // nothing new (the merging read never re-sees them)
    val v = spark.sql(s"SELECT MAX(version) FROM $t.history").collect()(0).getInt(0)
    spark.sql(s"DELETE FROM $t WHERE k = 5")
    spark.sql(s"SELECT MAX(version) FROM $t.history").collect()(0).getInt(0) shouldBe v

    // time travel: the pre-delete snapshot still sees every row
    val preV = 4 // after threeCommits: create + 3 appends
    spark.sql(s"SELECT * FROM $t VERSION AS OF $preV").count() shouldBe 300

    // the changelog attributes the positional delete to its commit
    val posV = spark.sql(s"SELECT MAX(version) FROM $t.history").collect()(0).getInt(0)
    val cdc = Maintenance.changelogBetween(
      spark, "lakehouse", Seq("mor_ns"), "pos2", posV - 1, posV).collect()
    cdc.map(r => (r.getString(1), r.getString(2))) shouldBe Array(("v1-50", "delete"))

    // materialization rewrites only the two dirty files and clears both
    MergeOnRead.materializeDeletes(spark, "lakehouse", Seq("mor_ns"), "pos2") shouldBe 2
    spark.sql(s"SELECT * FROM $t.delete_files").count() shouldBe 0
    spark.table(t).count() shouldBe 289
    antiJoins(spark.table(t)) shouldBe 0
    spark.sql(s"DROP TABLE $t")
  }

  test("positional dirty branch keeps filter pushdown and column pruning") {
    val t = "lakehouse.mor_ns.pplan"
    threeCommits(t)
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES " +
      "('graft.delete.mode'='merge-on-read-positional')")
    spark.sql(s"DELETE FROM $t WHERE k >= 110 AND k < 120")

    // the positional branch scans through the v1 parquet path (it needs
    // _metadata.row_index) — pushdown and pruning must survive there
    def planOf(df: org.apache.spark.sql.DataFrame): String = {
      df.collect()
      df.queryExecution.executedPlan.toString
    }
    val filtered = spark.table(t).where($"k" === 115)
    filtered.count() shouldBe 0 // deleted
    val fPlan = planOf(spark.table(t).where($"k" === 5))
    fPlan should include("PushedFilters")
    fPlan should include("k")

    val vOnly = spark.table(t).select("v")
    val vPlan = planOf(vOnly)
    vOnly.count() shouldBe 290
    // at least one branch (the clean files) reads v alone
    vPlan should include("struct<v:string>")
    spark.sql(s"DROP TABLE $t")
  }

  test("merge-on-read UPDATE: one commit, no data file rewritten, updates not re-matched") {
    val t = "lakehouse.mor_ns.upd1"
    threeCommits(t)
    val before = files(t)
    val v0 = spark.sql(s"SELECT MAX(version) FROM $t.history").collect()(0).getInt(0)

    val n = MergeOnRead.morUpdateWhere(spark, "lakehouse", Seq("mor_ns"), "upd1",
      $"k" >= 110 && $"k" < 120,
      Map("v" -> org.apache.spark.sql.functions.concat($"v",
        org.apache.spark.sql.functions.lit("-upd"))))
    n shouldBe 10

    // exactly ONE commit; every pre-existing file still referenced;
    // one appended file; one positional entry
    spark.sql(s"SELECT MAX(version) FROM $t.history").collect()(0).getInt(0) shouldBe v0 + 1
    (files(t).toSet intersect before.toSet) should have size before.size
    files(t).size shouldBe before.size + 1
    val entries = spark.sql(s"SELECT kind FROM $t.delete_files").collect()
    entries.map(_.getString(0)) shouldBe Array("positional")

    // row count unchanged, updated rows visible, originals gone
    spark.table(t).count() shouldBe 300
    spark.table(t).where($"k" === 115).collect().map(_.getString(1)) shouldBe Array("v1-15-upd")
    spark.table(t).where($"v" === "v1-15").count() shouldBe 0
    spark.table(t).where($"k" === 50).collect().map(_.getString(1)) shouldBe Array("v0-50")

    // a second UPDATE matches the UPDATED rows (they live in the new
    // file the entry does not apply to) — no lost updates, no doubling
    MergeOnRead.morUpdateWhere(spark, "lakehouse", Seq("mor_ns"), "upd1",
      $"k" === 115,
      Map("v" -> org.apache.spark.sql.functions.lit("final"))) shouldBe 1
    spark.table(t).where($"k" === 115).collect().map(_.getString(1)) shouldBe Array("final")
    spark.table(t).count() shouldBe 300

    // zero-match update is a no-op commit-wise
    val v1 = spark.sql(s"SELECT MAX(version) FROM $t.history").collect()(0).getInt(0)
    MergeOnRead.morUpdateWhere(spark, "lakehouse", Seq("mor_ns"), "upd1",
      $"k" === 99999, Map("v" -> org.apache.spark.sql.functions.lit("x"))) shouldBe 0
    spark.sql(s"SELECT MAX(version) FROM $t.history").collect()(0).getInt(0) shouldBe v1

    // materialization folds everything back to join-free scans
    MergeOnRead.materializeDeletes(spark, "lakehouse", Seq("mor_ns"), "upd1")
    spark.table(t).count() shouldBe 300
    spark.table(t).where($"k" === 115).collect().map(_.getString(1)) shouldBe Array("final")
    antiJoins(spark.table(t)) shouldBe 0
    spark.sql(s"DROP TABLE $t")
  }

  test("CALL system.mor_update parses predicate and assignment list") {
    val t = "lakehouse.mor_ns.upd2"
    threeCommits(t)
    spark.sql(s"CALL lakehouse.system.mor_update('mor_ns', 'upd2', " +
      s"'k IN (5, 6)', 'v = concat(v, ''-x''), k = k + 1000')")
      .collect()(0).getLong(0) shouldBe 2
    spark.table(t).where($"k" === 1005).collect().map(_.getString(1)) shouldBe Array("v0-5-x")
    spark.table(t).where($"k" === 5).count() shouldBe 0
    spark.table(t).count() shouldBe 300
    spark.sql(s"DROP TABLE $t")
  }

  test("metadata round-trip: fileSeq and deleteFiles survive the JSON log") {
    val t = "lakehouse.mor_ns.m15"
    threeCommits(t)
    MergeOnRead.morDelete(spark, "lakehouse", Seq("mor_ns"), "m15", Seq(8).toDF("k"))
    val dir = tableDir("m15")
    val meta = TableMetadata.load(dir)
    val reparsed = TableMetadata.fromJson(meta.toJson)
    reparsed.deleteFiles shouldBe meta.deleteFiles
    reparsed.fileSeq shouldBe meta.fileSeq
    meta.deleteFiles should have size 1
    meta.deleteFiles.head.keyColumns shouldBe Seq("k")
    meta.deleteFiles.head.rows shouldBe 1
    meta.deleteFiles.head.keyRanges.keySet should contain("k")
    // every data file carries the version of the commit that added it
    meta.files.foreach(f => meta.fileSeq.keySet should contain(f))
    meta.fileSeq.values.toSet.size shouldBe 3 // three append commits
    spark.sql(s"DROP TABLE $t")
  }
}
