package graft

import java.nio.file.{Files, Path, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.catalog.{Maintenance, Manifests, Snapshot, TableMetadata}

/** The Iceberg-shaped metadata layout ([[Manifests]]): per-version
  * payloads hold a manifest LIST; per-file metadata lives in immutable
  * manifest chunks. These specs pin the scale contract the layout
  * exists for — commit IO and steady-state load IO are O(changed
  * files), never O(table) — plus the version-hint fast path, legacy
  * migration, and orphan-chunk GC. */
class ManifestMetadataSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tableDir(ns: String, t: String) = Paths.get(TestSpark.warehouse, ns, t)
  private def mdDir(dir: Path) = TableMetadata.metadataDir(dir)

  private def manifestFiles(dir: Path): Seq[Path] =
    graft.catalog.Fs.children(mdDir(dir)).filter { p =>
      val n = p.getFileName.toString
      n.startsWith("m-") && n.endsWith(".json")
    }.sortBy(_.getFileName.toString)

  test("commit IO is O(delta): appends reuse every previous manifest by reference") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.mf")
    spark.sql("CREATE TABLE lakehouse.mf.t1 (k INT, v STRING)")
    val dir = tableDir("mf", "t1")
    (0 until 5).foreach { c =>
      (0 until 50).map(i => (c * 50 + i, s"v$i")).toDF("k", "v")
        .createOrReplaceTempView("mf_src")
      spark.sql("INSERT INTO lakehouse.mf.t1 SELECT * FROM mf_src")
    }
    val meta = TableMetadata.load(dir)
    meta.files.size should be >= 5
    // the version payload inlines NO per-file metadata
    val payload = Files.readString(TableMetadata.versionFile(dir, meta.version))
    payload should not include "fileStats"
    payload should include("manifests")
    // each append added chunks for ITS files only and reused the rest:
    // the manifest list grows, earlier refs stay byte-identical (same
    // chunk file on disk, same name)
    val prev = TableMetadata.loadFile(dir, TableMetadata.versionFile(dir, meta.version - 1))
    meta.manifests.map(_.path) should contain allElementsOf prev.manifests.map(_.path)
    val newChunks = meta.manifests.map(_.path).diff(prev.manifests.map(_.path))
    newChunks should not be empty
    newChunks.map(n => meta.manifests.find(_.path == n).get.count).sum shouldBe
      (meta.files.size - prev.files.size)

    // the payload grows O(1) per commit — one snapshot + one ref —
    // REGARDLESS of how many files the commit adds. A 200-file commit
    // (synthetic entries, stats included) moves the payload by about
    // as much as a 1-file commit; the legacy inline format would have
    // added ~200 stat blocks (~20 KB+)
    val sizeBefore = Files.size(TableMetadata.versionFile(dir, meta.version))
    val fake = (0 until 200).map(i => f"data/cbig/part-$i%05d.parquet")
    val committed = TableMetadata.commit(dir, meta.copy(
      version = meta.version + 1,
      files = meta.files ++ fake,
      fileStats = meta.fileStats ++ fake.map(f =>
        f -> Map("k" -> graft.catalog.ColumnRange("0", "99", Some(0L)))),
      fileRows = meta.fileRows ++ fake.map(_ -> 10L),
      snapshots = meta.snapshots :+ Snapshot(
        meta.version + 1, 1L, "append", fake.size, meta.files.size + fake.size)))
    val sizeAfter = Files.size(TableMetadata.versionFile(dir, committed.version))
    (sizeAfter - sizeBefore) should be < 1500L // one ref + one snapshot, not 200 entries
    // ...and the 200 entries live in exactly the new chunk(s)
    val bigChunks = committed.manifests.map(_.path).diff(meta.manifests.map(_.path))
    bigChunks.map(n => committed.manifests.find(_.path == n).get.count).sum shouldBe 200
    spark.sql("DROP TABLE lakehouse.mf.t1")
  }

  test("steady-state load parses only the delta (manifest cache)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.mf")
    spark.sql("CREATE TABLE lakehouse.mf.t2 (k INT, v STRING)")
    val dir = tableDir("mf", "t2")
    (0 until 4).foreach { c =>
      (0 until 20).map(i => (c * 20 + i, s"v$i")).toDF("k", "v")
        .createOrReplaceTempView("mf_src2")
      spark.sql("INSERT INTO lakehouse.mf.t2 SELECT * FROM mf_src2")
    }
    TableMetadata.load(dir) // warm the cache
    Manifests.resetCounters()
    TableMetadata.load(dir)
    Manifests.manifestsParsed.get() shouldBe 0 // fully warm: zero manifest IO
    Manifests.bytesRead.get() shouldBe 0

    // one more append: the next load parses ONLY the new chunk(s)
    Seq((999, "z")).toDF("k", "v").createOrReplaceTempView("mf_src2b")
    spark.sql("INSERT INTO lakehouse.mf.t2 SELECT * FROM mf_src2b")
    // (the commit itself seeds the cache; simulate a second process by
    // dropping it, then warming everything except the new chunk)
    val cur = TableMetadata.load(dir)
    Manifests.clearCacheForTesting()
    val prevChunks = cur.manifests.map(_.path).dropRight(1)
    prevChunks.foreach(p => Manifests.read(mdDir(dir), cur.manifests.find(_.path == p).get))
    Manifests.resetCounters()
    TableMetadata.load(dir)
    Manifests.manifestsParsed.get() shouldBe 1 // just the appended chunk
    spark.sql("DROP TABLE lakehouse.mf.t2")
  }

  test("a removal rewrites only the covering manifest; the rest pass by reference") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.mf")
    spark.sql("CREATE TABLE lakehouse.mf.t3 (k INT, v STRING)")
    val dir = tableDir("mf", "t3")
    (0 until 3).foreach { c =>
      Seq((c, s"v$c")).toDF("k", "v").createOrReplaceTempView("mf_src3")
      spark.sql("INSERT INTO lakehouse.mf.t3 SELECT * FROM mf_src3")
    }
    val before = TableMetadata.load(dir)
    before.manifests.size shouldBe 3
    // remove ONE file from the middle commit's chunk (a compaction /
    // COW-rewrite shape), keep everything else
    val victim = before.manifests(1)
    val victimEntries = Manifests.read(mdDir(dir), victim)
    val removed = victimEntries.head.path
    val committed = TableMetadata.commit(dir, before.copy(
      version = before.version + 1,
      files = before.files.filterNot(_ == removed),
      fileStats = before.fileStats - removed,
      fileRows = before.fileRows - removed,
      snapshots = before.snapshots :+ Snapshot(
        before.version + 1, 1L, "delete", 0, before.files.size - 1)))
    // chunks 0 and 2 are reused verbatim; chunk 1 was fully consumed by
    // the removal (single entry) and dropped — no new chunk written
    committed.manifests.map(_.path) shouldBe
      Seq(before.manifests(0).path, before.manifests(2).path)
    // file order survives the surgery
    TableMetadata.load(dir).files shouldBe before.files.filterNot(_ == removed)
    spark.sql("DROP TABLE lakehouse.mf.t3")
  }

  test("version-hint ends directory listings; stale or missing hints self-heal") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.mf")
    spark.sql("CREATE TABLE lakehouse.mf.t4 (k INT)")
    val dir = tableDir("mf", "t4")
    Seq(1, 2).toDF("k").createOrReplaceTempView("mf_src4")
    spark.sql("INSERT INTO lakehouse.mf.t4 SELECT * FROM mf_src4")
    val hint = mdDir(dir).resolve("version-hint.text")
    Files.exists(hint) shouldBe true
    val v = TableMetadata.currentVersion(dir)
    Files.readString(hint).trim.toInt shouldBe v
    // stale hint (a racer's commit advanced past it): probe-forward finds the head
    Files.writeString(hint, "1")
    TableMetadata.currentVersion(dir) shouldBe v
    // missing hint (pre-hint table): listing fallback
    Files.delete(hint)
    TableMetadata.currentVersion(dir) shouldBe v
    // the next commit restores it
    spark.sql("INSERT INTO lakehouse.mf.t4 SELECT * FROM mf_src4")
    Files.readString(hint).trim.toInt shouldBe v + 1
    spark.sql("DROP TABLE lakehouse.mf.t4")
  }

  test("legacy inline payloads load unchanged and migrate on the first commit") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.mf")
    spark.sql("CREATE TABLE lakehouse.mf.t5 (k INT, v STRING)")
    val dir = tableDir("mf", "t5")
    Seq((1, "a"), (2, "b")).toDF("k", "v").createOrReplaceTempView("mf_src5")
    spark.sql("INSERT INTO lakehouse.mf.t5 SELECT * FROM mf_src5")
    // rewrite the whole log in the LEGACY inline format (a table from
    // before the manifest layout)
    val log = TableMetadata.loadLog(dir)
    manifestFiles(dir).foreach(Files.delete(_))
    log.foreach { m =>
      Files.writeString(TableMetadata.versionFile(dir, m.version),
        m.copy(manifests = Seq.empty).toJson)
    }
    val legacy = TableMetadata.load(dir)
    legacy.manifests shouldBe empty
    legacy.files should contain theSameElementsAs log.last.files
    legacy.fileStats shouldBe log.last.fileStats
    legacy.fileSeq shouldBe log.last.fileSeq
    spark.table("lakehouse.mf.t5").count() shouldBe 2
    // first post-upgrade commit migrates: everything lands in chunks
    spark.sql("INSERT INTO lakehouse.mf.t5 SELECT * FROM mf_src5")
    val migrated = TableMetadata.load(dir)
    migrated.manifests should not be empty
    migrated.manifests.map(_.count).sum shouldBe migrated.files.size
    // seqs carried over from the legacy fileSeq map, not re-minted
    legacy.files.foreach { f =>
      migrated.fileSeq(f) shouldBe legacy.fileSeq(f)
    }
    spark.table("lakehouse.mf.t5").count() shouldBe 4
    spark.sql("DROP TABLE lakehouse.mf.t5")
  }

  test("orphan manifest chunks are reaped at expire; referenced and young ones survive") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.mf")
    spark.sql("CREATE TABLE lakehouse.mf.t6 (k INT)")
    val dir = tableDir("mf", "t6")
    (0 until 3).foreach { _ =>
      Seq(1).toDF("k").createOrReplaceTempView("mf_src6")
      spark.sql("INSERT INTO lakehouse.mf.t6 SELECT * FROM mf_src6")
    }
    val live = manifestFiles(dir).map(_.getFileName.toString).toSet
    // a crashed commit: chunk written, version never published
    val orphan = mdDir(dir).resolve("m-99-deadbeef.json")
    Files.writeString(orphan, """{"entries":[]}""")
    Files.setLastModifiedTime(orphan,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 3600000))
    // a FRESH unreferenced chunk (an in-flight commit): must survive the grace
    val inflight = mdDir(dir).resolve("m-99-cafebabe.json")
    Files.writeString(inflight, """{"entries":[]}""")
    Maintenance.expireSnapshots(spark, "lakehouse", Seq("mf"), "t6", retainVersions = 10)
    Files.exists(orphan) shouldBe false
    Files.exists(inflight) shouldBe true
    manifestFiles(dir).map(_.getFileName.toString).toSet should contain allElementsOf live
    Files.delete(inflight)
    // expiring versions makes their exclusive chunks orphans too —
    // here every version shares its tail, so only verify the table
    // still loads and scans after the expire
    spark.table("lakehouse.mf.t6").count() shouldBe 3
    spark.sql("DROP TABLE lakehouse.mf.t6")
  }

  test("rewrite_manifests consolidates per-commit refs into minimal chunks, readers unchanged") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.mf")
    spark.sql("CREATE TABLE lakehouse.mf.t9 (k INT, v STRING)")
    val dir = tableDir("mf", "t9")
    // 6 small appends → 6 single-entry manifest refs (the streaming-sink
    // accrual shape)
    (0 until 6).foreach { c =>
      Seq((c, s"v$c")).toDF("k", "v").createOrReplaceTempView("mf9_src")
      spark.sql("INSERT INTO lakehouse.mf.t9 SELECT * FROM mf9_src")
    }
    val before = TableMetadata.load(dir)
    before.manifests.size shouldBe 6
    spark.sql("SELECT COUNT(*) FROM lakehouse.mf.t9.manifests")
      .collect()(0).getLong(0) shouldBe 6L

    spark.sql("CALL lakehouse.system.rewrite_manifests('mf', 't9')")
      .collect()(0).getLong(0) shouldBe 1L
    val after = TableMetadata.load(dir)
    after.manifests.size shouldBe 1
    // same table in every observable way: files, order, seqs, stats
    after.files shouldBe before.files
    after.fileSeq shouldBe before.fileSeq
    after.fileStats shouldBe before.fileStats
    after.fileRows shouldBe before.fileRows
    spark.table("lakehouse.mf.t9").orderBy("k").select("k")
      .collect().map(_.getInt(0)) shouldBe (0 until 6).toArray
    // metadata-only: a rewrite-manifests snapshot, no data files added
    spark.sql("SELECT operation FROM lakehouse.mf.t9.history ORDER BY version DESC LIMIT 1")
      .collect()(0).getString(0) shouldBe "rewrite-manifests"
    // already minimal → no-op, no new version
    spark.sql("CALL lakehouse.system.rewrite_manifests('mf', 't9')")
      .collect()(0).getLong(0) shouldBe 1L
    TableMetadata.currentVersion(dir) shouldBe after.version
    // time travel through the consolidation still resolves old versions
    spark.sql("SELECT * FROM lakehouse.mf.t9 VERSION AS OF 3").count() shouldBe 2
    spark.sql("DROP TABLE lakehouse.mf.t9")
  }

  test("expire corrects a stale version hint before creating gaps below current") {
    // a commit's hint write is best-effort and may fail, leaving the
    // hint at an old version; if that version is RETAINED (tagged) and
    // expire then deletes its successors, a forward probe from the
    // stale hint would stop at the gap and resolve a HISTORIC version
    // as current — expire must advance the hint strictly first
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.mf")
    spark.sql("CREATE TABLE lakehouse.mf.t7 (k INT)") // v1
    (1 to 5).foreach { i => // v2..v6
      Seq(i).toDF("k").createOrReplaceTempView("mf7_src")
      spark.sql("INSERT INTO lakehouse.mf.t7 SELECT * FROM mf7_src")
    }
    spark.sql("CALL lakehouse.system.tag('mf', 't7', 'keep', 2)")
    val dir = tableDir("mf", "t7")
    TableMetadata.currentVersion(dir) shouldBe 7 // tag committed v7
    // simulate the failed hint advance: stale at the tagged version
    java.nio.file.Files.writeString(mdDir(dir).resolve("version-hint.text"), "2")
    spark.sql("CALL lakehouse.system.expire_snapshots('mf', 't7', 2)")
    // versions 3..5 are tombstoned (2 is tagged, 6..7 retained): the
    // expired range sits directly above the old hint — current must
    // still resolve to 7, and the expired slot reads as expired
    intercept[Exception] {
      spark.sql("SELECT * FROM lakehouse.mf.t7 VERSION AS OF 3").count()
    }.getMessage should include("expired")
    TableMetadata.currentVersion(dir) shouldBe 7
    spark.table("lakehouse.mf.t7").count() shouldBe 5
    spark.sql("DROP TABLE lakehouse.mf.t7")
  }

  test("a manifest whose entry count disagrees with its committed ref fails loudly") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.mf")
    spark.sql("CREATE TABLE lakehouse.mf.t8 (k INT)")
    Seq(1, 2).toDF("k").createOrReplaceTempView("mf8_src")
    spark.sql("INSERT INTO lakehouse.mf.t8 SELECT * FROM mf8_src")
    val dir = tableDir("mf", "t8")
    val cur = TableMetadata.currentVersion(dir)
    val summary = TableMetadata.fromJson(
      java.nio.file.Files.readString(TableMetadata.versionFile(dir, cur)))
    summary.manifests should not be empty
    val victim = mdDir(dir).resolve(summary.manifests.head.path)
    // truncate the chunk on disk (bit rot / partial copy); the ref's
    // recorded count must catch it instead of silently shrinking the table
    val original = java.nio.file.Files.readString(victim)
    java.nio.file.Files.writeString(victim, """{"entries":[]}""")
    graft.catalog.Manifests.clearCacheForTesting()
    val e = intercept[IllegalStateException] { TableMetadata.load(dir) }
    e.getMessage should include("corrupt manifest")
    java.nio.file.Files.writeString(victim, original) // heal so DROP can load
    graft.catalog.Manifests.clearCacheForTesting()
    spark.sql("DROP TABLE lakehouse.mf.t8")
  }

  test("a cold driver's partition-predicate scan parses ONLY the overlapping chunks") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.mf")
    spark.sql("DROP TABLE IF EXISTS lakehouse.mf.t9")
    spark.sql("CREATE TABLE lakehouse.mf.t9 (k INT, v STRING, p STRING) PARTITIONED BY (p)")
    val dir = tableDir("mf", "t9")
    // six commits, one partition value each → six chunks, each with a
    // single-value summary range on p
    val parts = Seq("a", "b", "c", "d", "e", "f")
    parts.foreach { pv =>
      (0 until 20).map(i => (i, s"$pv-$i", pv)).toDF("k", "v", "p")
        .createOrReplaceTempView("mf9_src")
      spark.sql("INSERT INTO lakehouse.mf.t9 SELECT * FROM mf9_src")
    }
    val summary = TableMetadata.loadSummary(dir)
    summary.manifests.size should be >= 6
    summary.manifests.foreach { r =>
      r.summary.keySet should contain("p") // the partition column is summarized
    }
    // COLD driver: empty manifest cache, then ONE single-partition query
    Manifests.clearCacheForTesting()
    Manifests.resetCounters()
    spark.table("lakehouse.mf.t9").where($"p" === "c")
      .count() shouldBe 20
    val parsed = Manifests.manifestsParsed.get()
    // only the chunk(s) whose summary covers p='c' were parsed — the
    // pre-summary behavior parsed all ≥6 on the first load
    parsed should be >= 1L
    parsed should be <= 2L
    // scan instrumentation still reports the TRUE table size as the
    // denominator (chunk skipping must not misreport totals)
    graft.catalog.LakehouseTable.lastScanFileCounts.get()._2 shouldBe
      summary.manifests.map(_.count).sum
    // (exact pushdown / metadata aggregates on clustered int columns
    // are pinned unchanged by AggPushdownSpec — strings never qualify)
    // an UNFILTERED scan still resolves everything
    Manifests.clearCacheForTesting()
    Manifests.resetCounters()
    spark.table("lakehouse.mf.t9").count() shouldBe 120
    Manifests.manifestsParsed.get() should be >= 6L
    spark.sql("DROP TABLE lakehouse.mf.t9")
  }

  test("a filter mixing summarized and unsummarized columns still skips chunks, correctly") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.mf")
    spark.sql("DROP TABLE IF EXISTS lakehouse.mf.t10")
    spark.sql("CREATE TABLE lakehouse.mf.t10 (k INT, p STRING) PARTITIONED BY (p)")
    Seq("a", "b", "c").foreach { pv =>
      (0 until 30).map(i => (i, pv)).toDF("k", "p").createOrReplaceTempView("mf10_src")
      spark.sql("INSERT INTO lakehouse.mf.t10 SELECT * FROM mf10_src")
    }
    Manifests.clearCacheForTesting()
    Manifests.resetCounters()
    // p is summarized (partition col); k is not — the k conjunct must
    // neither skip chunks (no summary) nor break the p-skip
    spark.table("lakehouse.mf.t10")
      .where($"p" === "b" && $"k" >= 10).count() shouldBe 20
    Manifests.manifestsParsed.get() should be <= 2L // only p='b' chunks parsed
    spark.sql("DROP TABLE lakehouse.mf.t10")
  }

  test("chunk summaries fold soundly: mixed-value and null-bearing chunks never skip a match") {
    import graft.catalog.{ColumnRange, ManifestEntry}
    val schema = new org.apache.spark.sql.types.StructType()
      .add("p", org.apache.spark.sql.types.StringType)
      .add("k", org.apache.spark.sql.types.IntegerType)
    def e(path: String, min: String, max: String, nulls: Option[Long]) =
      ManifestEntry(path, Some(1L), 1, Map("p" -> ColumnRange(min, max, nulls)))
    // merged range spans all entries; nulls sum only when all known
    val s1 = Manifests.summarize(
      Seq(e("f1", "a", "c", Some(0L)), e("f2", "b", "e", Some(2L))), Seq("p"), schema)
    s1("p").min shouldBe "a"
    s1("p").max shouldBe "e"
    s1("p").nulls shouldBe Some(2L)
    // any entry with an unknown null count → summary nulls unknown
    // (IsNull can then never skip the chunk)
    Manifests.summarize(
      Seq(e("f1", "a", "c", None), e("f2", "b", "e", Some(0L))), Seq("p"), schema)
      .apply("p").nulls shouldBe None
    // a column missing from ANY entry drops from the summary entirely
    Manifests.summarize(
      Seq(e("f1", "a", "c", Some(0L)),
        ManifestEntry("f3", Some(1L), 1, Map.empty)), Seq("p"), schema) shouldBe empty
    // all-null chunks summarize as all-null; mixed chunks keep values
    val s2 = Manifests.summarize(
      Seq(ManifestEntry("f4", Some(1L), 1,
        Map("p" -> ColumnRange("", "", Some(5L), hasValues = false)))), Seq("p"), schema)
    s2("p").hasValues shouldBe false
    val s3 = Manifests.summarize(
      Seq(
        ManifestEntry("f5", Some(1L), 1,
          Map("p" -> ColumnRange("", "", Some(5L), hasValues = false))),
        e("f6", "b", "d", Some(0L))), Seq("p"), schema)
    s3("p").hasValues shouldBe true
    s3("p").min shouldBe "b"
    s3("p").nulls shouldBe Some(5L)
  }

  test("corrupt stats bounds fail loudly; only the explicit allNull marker reads as all-null") {
    val dir = Files.createTempDirectory("graft-corrupt-stats-")
    def chunk(statsJson: String): Seq[graft.catalog.ManifestEntry] = {
      val f = dir.resolve(s"m-1-${java.util.UUID.randomUUID()}.json")
      Files.writeString(f,
        s"""{"entries":[{"path":"data/a.parquet","seq":1,"rows":10,
           |"stats":{"k":$statsJson}}]}""".stripMargin.replace("\n", ""))
      Manifests.read(dir, graft.catalog.ManifestRef(f.getFileName.toString, 1))
    }
    // the two legitimate shapes
    chunk("""{"min":"1","max":"9","nulls":0}""")
      .head.stats("k").hasValues shouldBe true
    chunk("""{"allNull":true,"nulls":10}""")
      .head.stats("k").hasValues shouldBe false
    // bit-rot shapes: a lost bound must never read as an all-null claim
    // FileSkipping could wrongly skip a live file on (the json4s
    // predecessor NPE'd on these; the cursor parser must refuse too)
    an[IllegalStateException] should be thrownBy
      chunk("""{"min":null,"max":"9"}""")
    an[IllegalStateException] should be thrownBy
      chunk("""{"min":"1"}""")
    an[IllegalStateException] should be thrownBy
      chunk("""{"nulls":10}""") // both bounds gone, no marker
    graft.catalog.Fs.deleteRecursively(dir)
  }

  // ---- the declared-append O(delta) contract ([[TableMetadata.AppendDelta]]) ----

  private val deltaSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("k",
      org.apache.spark.sql.types.IntegerType)))

  private def freshDeltaTable(n: Int): (Path, TableMetadata) = {
    val dir = Files.createTempDirectory("graft-delta-")
    var m = TableMetadata.commit(dir, TableMetadata(
      version = 1, name = "d", schema = deltaSchema,
      partitionColumns = Nil, properties = Map.empty,
      files = Nil, snapshots = Seq(Snapshot(1, 1L, "create", 0, 0))))
    val rels = (0 until n).map(i => f"data/c0/part-$i%05d.parquet")
    m = TableMetadata.commit(dir, m.copy(
      version = 2, files = rels,
      fileRows = rels.map(_ -> 10L).toMap,
      snapshots = m.snapshots :+ Snapshot(2, 2L, "append", n, n)))
    (dir, m)
  }

  test("a DECLARED append commits byte-equivalently to the scanning path") {
    val (dir, base) = freshDeltaTable(40)
    val add = Seq("data/c1/a.parquet", "data/c1/b.parquet")
    val attempt = base.copy(
      version = 3, files = base.files ++ add,
      fileRows = base.fileRows ++ add.map(_ -> 5L),
      snapshots = base.snapshots :+ Snapshot(3, 3L, "append", 2, 42))
    val declared = TableMetadata.commit(dir, attempt,
      Some(TableMetadata.AppendDelta(add)))
    // previous chunks reused by reference, one fresh chunk for the adds
    declared.manifests.map(_.path) should contain allElementsOf
      base.manifests.map(_.path)
    declared.manifests.size shouldBe base.manifests.size + 1
    // the loaded snapshot is indistinguishable from an undeclared one
    TableMetadata.clearRenderCacheForTesting()
    val loaded = TableMetadata.load(dir)
    loaded.files shouldBe declared.files
    loaded.fileSeq shouldBe declared.fileSeq
    loaded.fileRows.view.filterKeys(add.contains).toMap shouldBe
      add.map(_ -> 5L).toMap
    // every retained file keeps its predecessor seq; adds get v3
    base.files.foreach(f => loaded.fileSeq(f) shouldBe base.fileSeq(f))
    add.foreach(f => loaded.fileSeq(f) shouldBe 3)
    graft.catalog.Fs.deleteRecursively(dir)
  }

  test("an entry-only declaration (MoR delete shape) reuses every chunk") {
    val (dir, base) = freshDeltaTable(40)
    val committed = TableMetadata.commit(dir, base.copy(
      version = 3,
      deleteFiles = Seq(graft.catalog.DeleteFile(
        "deletes/d1.parquet", Seq("k"), 3, 1L)),
      snapshots = base.snapshots :+ Snapshot(3, 3L, "mor-delete", 0, 40)),
      Some(TableMetadata.AppendDelta(Nil)))
    committed.manifests shouldBe base.manifests // zero chunk churn
    TableMetadata.clearRenderCacheForTesting()
    TableMetadata.load(dir).deleteFiles.map(_.path) shouldBe
      Seq("deletes/d1.parquet")
    graft.catalog.Fs.deleteRecursively(dir)
  }

  test("a DRIFTED declaration falls back to full verification, never corrupts") {
    // the declaration claims pure append but the attempt also REMOVED a
    // file: the O(delta) path must refuse (count mismatch) and the
    // scanning path must land the truth
    val (dir, base) = freshDeltaTable(40)
    val add = Seq("data/c1/a.parquet")
    val dropped = base.files.head
    val attempt = base.copy(
      version = 3, files = base.files.tail ++ add,
      fileRows = (base.fileRows - dropped) ++ add.map(_ -> 5L),
      snapshots = base.snapshots :+ Snapshot(3, 3L, "rewrite", 1, 40))
    val committed = TableMetadata.commit(dir, attempt,
      Some(TableMetadata.AppendDelta(add)))
    TableMetadata.clearRenderCacheForTesting()
    val loaded = TableMetadata.load(dir)
    loaded.files should not contain dropped
    loaded.files should contain("data/c1/a.parquet")
    loaded.files.size shouldBe 40
    // a declaration re-adding an EXISTING file must also fall back
    val attempt2 = loaded.copy(
      version = 4, files = loaded.files,
      snapshots = loaded.snapshots :+ Snapshot(4, 4L, "noop", 0, 40))
    val c2 = TableMetadata.commit(dir, attempt2,
      Some(TableMetadata.AppendDelta(Seq(loaded.files.head))))
    c2.files.size shouldBe 40
    graft.catalog.Fs.deleteRecursively(dir)
  }

  test("the scanning fast path itself: cached predecessor, pure append, no declaration") {
    val (dir, base) = freshDeltaTable(40)
    // the state is cache-seeded by freshDeltaTable's commits; an
    // UNDECLARED pure append must still reuse every chunk
    val add = Seq("data/c2/x.parquet")
    val committed = TableMetadata.commit(dir, base.copy(
      version = 3, files = base.files ++ add,
      fileRows = base.fileRows ++ add.map(_ -> 7L),
      snapshots = base.snapshots :+ Snapshot(3, 3L, "append", 1, 41)))
    committed.manifests.map(_.path) should contain allElementsOf
      base.manifests.map(_.path)
    committed.manifests.size shouldBe base.manifests.size + 1
    // and a seq CHANGE on a retained file must rewrite its chunk (the
    // scan catches what the count arithmetic cannot)
    val resequenced = committed.copy(
      version = 4,
      fileSeq = committed.fileSeq + (base.files.head -> 1),
      snapshots = committed.snapshots :+ Snapshot(4, 4L, "rollback", 0, 41))
    val c2 = TableMetadata.commit(dir, resequenced)
    TableMetadata.clearRenderCacheForTesting()
    val loaded = TableMetadata.load(dir)
    loaded.fileSeq(base.files.head) shouldBe 1
    graft.catalog.Fs.deleteRecursively(dir)
  }
}
