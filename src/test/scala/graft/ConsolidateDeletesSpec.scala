package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.catalog.{Maintenance, MergeOnRead, TableMetadata}

/** Delete-file consolidation (`MergeOnRead.consolidateDeletes`,
  * Iceberg's rewrite_position_delete_files shape): N small delete
  * parquets from CDC-sized commits merge into one entry WITHOUT
  * touching data files, preserving exact delete semantics — including
  * the seq-gated re-insert exemption that forbids merging equality
  * entries across a data commit. */
class ConsolidateDeletesSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def files(t: String): Seq[String] =
    spark.sql(s"SELECT file_path FROM $t.files").collect().map(_.getString(0)).toSeq

  private def tableDir(name: String): java.nio.file.Path =
    spark.sessionState.catalogManager.catalog("lakehouse")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(Array("cds_ns"), name))
      .asInstanceOf[graft.catalog.LakehouseTable].tableDir

  private def mkTable(tbl: String, commits: Int = 3): Unit = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.cds_ns")
    spark.sql(s"CREATE TABLE $tbl (k INT, v STRING)")
    (0 until commits).foreach { c =>
      (0 until 100).map(i => (c * 100 + i, s"v$c-$i")).toDF("k", "v")
        .createOrReplaceTempView("cds_src")
      spark.sql(s"INSERT INTO $tbl SELECT * FROM cds_src")
    }
  }

  test("N equality entries merge to one; data untouched, reads exact") {
    val t = "lakehouse.cds_ns.c1"
    mkTable(t)
    val dataBefore = files(t)
    // four CDC-sized deletes → four entries
    Seq(Seq(10, 11), Seq(120, 121), Seq(230), Seq(42)).foreach { ks =>
      MergeOnRead.morDelete(spark, "lakehouse", Seq("cds_ns"), "c1", ks.toDF("k"))
    }
    val meta0 = TableMetadata.load(tableDir("c1"))
    meta0.deleteFiles.size shouldBe 4

    val removed = MergeOnRead.consolidateDeletes(spark, "lakehouse", Seq("cds_ns"), "c1")
    removed shouldBe 3

    val meta1 = TableMetadata.load(tableDir("c1"))
    meta1.deleteFiles.size shouldBe 1
    meta1.deleteFiles.head.rows shouldBe 6
    meta1.deleteFiles.head.keyColumns shouldBe Seq("k")
    // no data file touched
    files(t) should contain theSameElementsAs dataBefore
    // reads exact
    spark.table(t).count() shouldBe 294
    Seq(10, 11, 120, 121, 230, 42).foreach { k =>
      spark.table(t).where($"k" === k).count() shouldBe 0
    }
    spark.table(t).where($"k" === 12).count() shouldBe 1
    spark.sql(s"DROP TABLE $t")
  }

  test("equality entries never merge across a data commit (re-insert exemption)") {
    val t = "lakehouse.cds_ns.c2"
    mkTable(t)
    // delete 50, then RE-INSERT it, then two more deletes
    MergeOnRead.morDelete(spark, "lakehouse", Seq("cds_ns"), "c2", Seq(50).toDF("k"))
    Seq((50, "reborn")).toDF("k", "v").createOrReplaceTempView("cds_src2")
    spark.sql(s"INSERT INTO $t SELECT * FROM cds_src2")
    MergeOnRead.morDelete(spark, "lakehouse", Seq("cds_ns"), "c2", Seq(60).toDF("k"))
    MergeOnRead.morDelete(spark, "lakehouse", Seq("cds_ns"), "c2", Seq(70).toDF("k"))
    spark.table(t).where($"k" === 50).count() shouldBe 1 // exemption pre-merge

    val removed = MergeOnRead.consolidateDeletes(spark, "lakehouse", Seq("cds_ns"), "c2")
    removed shouldBe 1 // only the two post-re-insert entries merged

    val meta = TableMetadata.load(tableDir("c2"))
    meta.deleteFiles.size shouldBe 2
    // the straggler kept its original seq → the re-inserted row survives
    spark.table(t).where($"k" === 50).count() shouldBe 1
    spark.table(t).where($"k" === 60 || $"k" === 70).count() shouldBe 0
    spark.table(t).count() shouldBe 298
    spark.sql(s"DROP TABLE $t")
  }

  test("positional entries merge with seq preserved; reads exact") {
    val t = "lakehouse.cds_ns.c3"
    mkTable(t)
    val dir = tableDir("c3")
    val meta0 = TableMetadata.load(dir)
    val f0 = meta0.files.head
    val f1 = meta0.files(1)
    MergeOnRead.morDeletePositionalAt(spark, dir,
      Seq((f0, 0L), (f0, 1L)).toDF("file", "pos")) shouldBe 2
    MergeOnRead.morDeletePositionalAt(spark, dir,
      Seq((f1, 5L)).toDF("file", "pos")) shouldBe 1
    TableMetadata.load(dir).deleteFiles.size shouldBe 2

    val removed = MergeOnRead.consolidateDeletes(spark, "lakehouse", Seq("cds_ns"), "c3")
    removed shouldBe 1
    val meta1 = TableMetadata.load(dir)
    meta1.deleteFiles.size shouldBe 1
    meta1.deleteFiles.head.isPositional shouldBe true
    meta1.deleteFiles.head.rows shouldBe 3
    spark.table(t).count() shouldBe 297
    spark.sql(s"DROP TABLE $t")
  }

  test("duplicate tuples across entries dedupe in the merged file") {
    val t = "lakehouse.cds_ns.c4"
    mkTable(t, commits = 1)
    MergeOnRead.morDelete(spark, "lakehouse", Seq("cds_ns"), "c4", Seq(5, 6).toDF("k"))
    MergeOnRead.morDelete(spark, "lakehouse", Seq("cds_ns"), "c4", Seq(6, 7).toDF("k"))
    MergeOnRead.consolidateDeletes(spark, "lakehouse", Seq("cds_ns"), "c4") shouldBe 1
    val meta = TableMetadata.load(tableDir("c4"))
    meta.deleteFiles.head.rows shouldBe 3 // 5, 6, 7 — not 4
    spark.table(t).count() shouldBe 97
    spark.sql(s"DROP TABLE $t")
  }

  test("autoCompact relieves entry-count pressure by consolidating, not rewriting") {
    val t = "lakehouse.cds_ns.c5"
    mkTable(t)
    val dataBefore = files(t)
    // 10 one-key deletes: entry count 10 > maxEntries 8, but dead
    // fraction 10/300 is tiny at the default 0.05? no — 0.033 < 0.05 ✓
    (0 until 10).foreach { i =>
      MergeOnRead.morDelete(spark, "lakehouse", Seq("cds_ns"), "c5", Seq(i).toDF("k"))
    }
    TableMetadata.load(tableDir("c5")).deleteFiles.size shouldBe 10

    // targetFileBytes=1 makes idealFiles huge, so fragmentation can
    // never trigger a rewrite here — only the delete-pressure path
    val rewritten = Maintenance.autoCompact(spark, "lakehouse", Seq("cds_ns"), "c5",
      targetFileBytes = 1L)
    rewritten shouldBe 0 // no data-file rewrite happened
    files(t) should contain theSameElementsAs dataBefore
    TableMetadata.load(tableDir("c5")).deleteFiles.size shouldBe 1
    spark.table(t).count() shouldBe 290
    spark.sql(s"DROP TABLE $t")
  }

  test("changelog over a mixed-kind consolidation commit reports zero row changes") {
    val t = "lakehouse.cds_ns.c7"
    mkTable(t)
    val dir = tableDir("c7")
    val f0 = TableMetadata.load(dir).files.head
    // two equality + two positional entries, then one consolidation
    // commit that merges BOTH kinds at once (the shape that used to
    // trip changelogBetween's single-key-columns require)
    MergeOnRead.morDelete(spark, "lakehouse", Seq("cds_ns"), "c7", Seq(10).toDF("k"))
    MergeOnRead.morDelete(spark, "lakehouse", Seq("cds_ns"), "c7", Seq(11).toDF("k"))
    MergeOnRead.morDeletePositionalAt(spark, dir, Seq((f0, 20L)).toDF("file", "pos"))
    MergeOnRead.morDeletePositionalAt(spark, dir, Seq((f0, 21L)).toDF("file", "pos"))
    MergeOnRead.consolidateDeletes(spark, "lakehouse", Seq("cds_ns"), "c7") shouldBe 2
    val v = TableMetadata.load(dir).version
    TableMetadata.load(dir).deleteFiles.size shouldBe 2

    // the consolidation commit itself: no row changes
    Maintenance.changelogBetween(spark, "lakehouse", Seq("cds_ns"), "c7", v - 1, v)
      .count() shouldBe 0
    // the full window still reports the four original deletes
    val clog = Maintenance.changelogBetween(spark, "lakehouse", Seq("cds_ns"), "c7", 0, v)
    clog.filter($"_change_type" === "delete").count() shouldBe 4
    clog.filter($"_change_type" === "insert").count() shouldBe 300
    spark.table(t).count() shouldBe 296
    spark.sql(s"DROP TABLE $t")
  }

  test("vacuum reaps the superseded delete parquets; merged entry survives") {
    val t = "lakehouse.cds_ns.c8"
    mkTable(t, commits = 1)
    MergeOnRead.morDelete(spark, "lakehouse", Seq("cds_ns"), "c8", Seq(1).toDF("k"))
    MergeOnRead.morDelete(spark, "lakehouse", Seq("cds_ns"), "c8", Seq(2).toDF("k"))
    val dir = tableDir("c8")
    val oldPaths = TableMetadata.load(dir).deleteFiles.map(_.path)
    MergeOnRead.consolidateDeletes(spark, "lakehouse", Seq("cds_ns"), "c8") shouldBe 1
    val mergedPath = TableMetadata.load(dir).deleteFiles.head.path
    Maintenance.vacuum(spark, "lakehouse", Seq("cds_ns"), "c8",
      retainVersions = 1, retentionMs = 0L) should be >= 2
    oldPaths.foreach(p => java.nio.file.Files.exists(dir.resolve(p)) shouldBe false)
    java.nio.file.Files.exists(dir.resolve(mergedPath)) shouldBe true
    spark.table(t).count() shouldBe 98
    spark.sql(s"DROP TABLE $t")
  }

  test("append-only stream survives a consolidation commit in its window") {
    val t = "lakehouse.cds_ns.c9"
    mkTable(t, commits = 1)
    MergeOnRead.morDelete(spark, "lakehouse", Seq("cds_ns"), "c9", Seq(1).toDF("k"))
    MergeOnRead.morDelete(spark, "lakehouse", Seq("cds_ns"), "c9", Seq(2).toDF("k"))
    val vBefore = TableMetadata.load(tableDir("c9")).version
    MergeOnRead.consolidateDeletes(spark, "lakehouse", Seq("cds_ns"), "c9") shouldBe 1
    Seq((500, "new1"), (501, "new2")).toDF("k", "v").createOrReplaceTempView("cds_s9")
    spark.sql(s"INSERT INTO $t SELECT * FROM cds_s9")

    // stream window (vBefore, latest]: a consolidation commit (entry
    // rewrite, seq-invariant-proven) plus an append — must emit ONLY
    // the appended rows instead of dying on "merge-on-read commits"
    val ckpt = java.nio.file.Files.createTempDirectory("cds-ckpt-").toString
    val q = spark.readStream
      .option("startingVersion", vBefore.toString)
      .table(t)
      .writeStream.format("memory").queryName("cds_stream")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table("cds_stream").orderBy("k").collect().map(_.getInt(0)) shouldBe Array(500, 501)

    // a REAL MoR delete in the window still kills the stream loudly
    MergeOnRead.morDelete(spark, "lakehouse", Seq("cds_ns"), "c9", Seq(3).toDF("k"))
    val q2 = spark.readStream
      .option("startingVersion", vBefore.toString)
      .table(t)
      .writeStream.format("memory").queryName("cds_stream2")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("cds-ckpt2-").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.awaitTermination()
    }
    Iterator.iterate(err: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(e => Option(e.getMessage).exists(_.contains("merge-on-read delete commits")))
      .shouldBe(true)
    spark.sql(s"DROP TABLE $t")
  }

  test("SQL face: CALL system.consolidate_deletes") {
    val t = "lakehouse.cds_ns.c6"
    mkTable(t, commits = 1)
    MergeOnRead.morDelete(spark, "lakehouse", Seq("cds_ns"), "c6", Seq(1).toDF("k"))
    MergeOnRead.morDelete(spark, "lakehouse", Seq("cds_ns"), "c6", Seq(2).toDF("k"))
    val out = spark.sql("CALL lakehouse.system.consolidate_deletes('cds_ns', 'c6')").collect()
    out(0).getLong(0) shouldBe 1L
    spark.table(t).count() shouldBe 98
    spark.sql(s"DROP TABLE $t")
  }

  test("an empty upsert batch publishes its appends but never a zero-row entry") {
    val t = "lakehouse.cds_ns.c_empty"
    mkTable(t, commits = 1)
    val dir = tableDir("c_empty")
    import spark.implicits._
    // empty key batch + empty append: no-op, no entry
    MergeOnRead.morUpsert(spark, "lakehouse", Seq("cds_ns"), "c_empty",
      Seq.empty[(Int, String)].toDF("k", "v"), Seq("k"))
    TableMetadata.load(dir).deleteFiles shouldBe empty
    // a zero-row entry would have NO keyRanges and applicable() treats
    // a missing range as "could match" — every file would turn dirty
    spark.table(t).count() shouldBe 100
  }

  test("a group whose merge would FAN OUT past its input count is left alone") {
    val t = "lakehouse.cds_ns.c_fan"
    mkTable(t, commits = 1)
    val dir = tableDir("c_fan")
    import spark.implicits._
    // two equality entries of 6 tuples each
    MergeOnRead.morDelete(spark, "lakehouse", Seq("cds_ns"), "c_fan",
      (0 until 6).toDF("k"))
    MergeOnRead.morDelete(spark, "lakehouse", Seq("cds_ns"), "c_fan",
      (6 until 12).toDF("k"))
    val before = TableMetadata.load(dir).deleteFiles
    before.size shouldBe 2
    // ceiling 3: the merged 12-tuple set would write 4 files >= 2 inputs
    spark.conf.set("graft.mor.maxSingleFileDeleteTuples", "3")
    try {
      MergeOnRead.consolidateDeletes(
        spark, "lakehouse", Seq("cds_ns"), "c_fan") shouldBe 0
      TableMetadata.load(dir).deleteFiles should contain theSameElementsAs before
    } finally spark.conf.unset("graft.mor.maxSingleFileDeleteTuples")
    // reads unaffected either way
    spark.table(t).count() shouldBe 88
  }

  test("racing positional UPDATEs of the same row: exactly one commits, no duplicate") {
    // each positional entry names only the (file, pos) of the snapshot
    // its writer read — if both committed, neither delete would cover
    // the other's appended row version and the row would DUPLICATE
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    import org.apache.spark.sql.functions.{concat, lit}
    for (round <- 0 until 3) {
      val t = s"lakehouse.cds_ns.c_race$round"
      mkTable(t, commits = 1)
      try {
        import spark.implicits._
        val fa = Future {
          try Right(MergeOnRead.morUpdateWhere(spark, "lakehouse", Seq("cds_ns"),
            s"c_race$round", $"k" === 5, Map("v" -> concat($"v", lit("-A")))))
          catch { case e: Throwable => Left(e.getMessage) }
        }
        val fb = Future {
          try Right(MergeOnRead.morUpdateWhere(spark, "lakehouse", Seq("cds_ns"),
            s"c_race$round", $"k" === 5, Map("v" -> concat($"v", lit("-B")))))
          catch { case e: Throwable => Left(e.getMessage) }
        }
        val ra = Await.result(fa, 120.seconds)
        val rb = Await.result(fb, 120.seconds)
        val rows = spark.table(t).where($"k" === 5).collect()
        withClue(s"round $round: a=$ra b=$rb rows=${rows.mkString}: ") {
          rows.length shouldBe 1 // never duplicated, never lost
          // at most one writer won; a loser failed clean
          if (ra.isRight && rb.isRight)
            fail("both positional updates of one row committed")
        }
      } finally spark.sql(s"DROP TABLE $t")
    }
  }
}
