package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types.{LongType, StructType}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.catalog.{ColumnRange, IdentityColumns, Maintenance, ManifestEntry,
  Manifests, Snapshot, TableMetadata}

/** Failure-mode hardening of the metadata layer: expire tombstones
  * (zombie commits into expired slots), manifest integrity on warm
  * caches, two-phase orphan reaping, and identity mint-mark
  * verifiability. Each test pins a failure a plain delete/skip-based
  * implementation exhibits. */
class MetadataRobustnessSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tableDir(t: String) = Paths.get(TestSpark.warehouse, "mrob_ns", t)

  private def mkTable(name: String, commits: Int): java.nio.file.Path = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.mrob_ns")
    spark.sql(s"CREATE TABLE lakehouse.mrob_ns.$name (k INT, v STRING)")
    (0 until commits).foreach { c =>
      (0 until 10).map(i => (c * 10 + i, s"v$c-$i")).toDF("k", "v")
        .createOrReplaceTempView(s"mrob_src_$name")
      spark.sql(s"INSERT INTO lakehouse.mrob_ns.$name SELECT * FROM mrob_src_$name")
    }
    tableDir(name)
  }

  test("a zombie commit into an expire-created slot fails clean; the log never forks") {
    val dir = mkTable("zomb", commits = 5) // v1 (create) .. v6
    // a committer loads v3's state, then stalls
    val stale = TableMetadata.loadFile(dir, TableMetadata.versionFile(dir, 3))
    TableMetadata.currentVersion(dir) shouldBe 6
    // meanwhile expire reclaims history below the retained window
    Maintenance.expireSnapshots(spark, "lakehouse", Seq("mrob_ns"), "zomb",
      retainVersions = 2) shouldBe 4 // v1..v4 expired
    // the zombie wakes and publishes v4 — the expired slot must REFUSE
    // (tombstone EEXIST), not accept a fork below head: with a deleted
    // slot its createLink would succeed, it would report success, and
    // no descendant of head would carry its file (a lost update)
    val e = intercept[IllegalStateException] {
      TableMetadata.commit(dir, stale.copy(
        version = 4,
        files = stale.files :+ "data/zombie/z0.parquet",
        snapshots = stale.snapshots :+
          Snapshot(4, 99L, "append", 1, stale.files.size + 1)))
    }
    e.getMessage should include("commit conflict")
    TableMetadata.currentVersion(dir) shouldBe 6
    TableMetadata.load(dir).files should not contain "data/zombie/z0.parquet"
    // a second expire run is a no-op on already-tombstoned slots
    Maintenance.expireSnapshots(spark, "lakehouse", Seq("mrob_ns"), "zomb",
      retainVersions = 2) shouldBe 0
    spark.sql("DROP TABLE lakehouse.mrob_ns.zomb")
  }

  test("expired slots read as a clean expired error, and reads skip them as gaps") {
    val dir = mkTable("tomb", commits = 4) // v1..v5
    Maintenance.expireSnapshots(spark, "lakehouse", Seq("mrob_ns"), "tomb",
      retainVersions = 2)
    // time travel to an expired slot: actionable error, not NoSuchFile
    // (below the floor the tombstone itself is garbage-collected, so
    // this exercises the floor-backed error path)
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM lakehouse.mrob_ns.tomb VERSION AS OF 2").count()
    }
    e.getMessage should include("expired")
    // the log walk treats expired slots as gaps
    TableMetadata.loadLog(dir).map(_.version) shouldBe Seq(4, 5)
    spark.sql("DROP TABLE lakehouse.mrob_ns.tomb")
  }

  test("tombstones below the expire floor are garbage-collected; the dir stays bounded") {
    val dir = mkTable("floor", commits = 7) // v1..v8
    Maintenance.expireSnapshots(spark, "lakehouse", Seq("mrob_ns"), "floor",
      retainVersions = 2) shouldBe 6 // v1..v6 expired
    val md = TableMetadata.metadataDir(dir)
    // the contiguous expired prefix is covered by the floor file and
    // its tombstones deleted — NOT one ~30-byte file per version forever
    TableMetadata.readFloor(md) shouldBe 6
    (1 to 6).foreach { v =>
      Files.exists(TableMetadata.versionFile(dir, v)) shouldBe false
    }
    // a zombie whose target slot's tombstone is GONE still fails clean:
    // the publish protocol re-checks the floor after claiming the slot
    val stale = TableMetadata.load(dir)
    val e = intercept[IllegalStateException] {
      TableMetadata.commit(dir, stale.copy(
        version = 3,
        files = stale.files :+ "data/zombie-floor/z0.parquet",
        snapshots = stale.snapshots :+
          Snapshot(3, 99L, "append", 1, stale.files.size + 1)))
    }
    e.getMessage should include("commit conflict")
    Files.exists(TableMetadata.versionFile(dir, 3)) shouldBe false // retracted
    TableMetadata.currentVersion(dir) shouldBe 8
    // a RETAINED island below the cutoff stops the floor: tag v7, expire
    // again after two more commits — v7 stays live and taggable-read
    Maintenance.tag(spark, "lakehouse", Seq("mrob_ns"), "floor", "keep", 7)
    (0 until 2).foreach { c =>
      (0 until 5).map(i => (900 + c * 10 + i, s"x$c-$i")).toDF("k", "v")
        .createOrReplaceTempView("mrob_src_floor2")
      spark.sql("INSERT INTO lakehouse.mrob_ns.floor SELECT * FROM mrob_src_floor2")
    }
    Maintenance.expireSnapshots(spark, "lakehouse", Seq("mrob_ns"), "floor",
      retainVersions = 2) shouldBe 2 // v8 + the tag's property commit (v7 tagged, head window retained)
    TableMetadata.readFloor(md) shouldBe 6 // the live tag stops the floor
    spark.sql("SELECT * FROM lakehouse.mrob_ns.floor VERSION AS OF 'keep'")
      .count() should be > 0L
    spark.sql("DROP TABLE lakehouse.mrob_ns.floor")
  }

  test("manifest ref/chunk count mismatch fails loudly on warm AND cold reads") {
    val md = Files.createTempDirectory("mrob-mf")
    val entries = (1 to 10).map(i =>
      ManifestEntry(s"data/f$i.parquet", Some(1L), 1, Map.empty))
    val ref = Manifests.write(md, 1, entries).head
    val bad = ref.copy(count = ref.count - 1)
    // warm: the committer seeded the cache — corruption detection must
    // not depend on a driver restart
    intercept[IllegalStateException] {
      Manifests.read(md, bad)
    }.getMessage should include("corrupt manifest")
    Manifests.clearCacheForTesting()
    intercept[IllegalStateException] {
      Manifests.read(md, bad)
    }.getMessage should include("corrupt manifest")
    // the true ref still reads
    Manifests.read(md, ref) should have size 10
  }

  test("a chunk parked under a crashed reap's trash name self-heals on read") {
    val md = Files.createTempDirectory("mrob-reap")
    val entries = (1 to 5).map(i =>
      ManifestEntry(s"data/g$i.parquet", Some(1L), 1, Map.empty))
    val ref = Manifests.write(md, 1, entries).head
    // simulate the reaper crashing between rename and decision
    val chunk = md.resolve(ref.path)
    Files.move(chunk, chunk.resolveSibling("." + ref.path + ".reap"))
    Manifests.clearCacheForTesting()
    Manifests.read(md, ref) should have size 5
    Files.exists(chunk) shouldBe true // restored in place
  }

  test("metadata dir stays bounded across repeated commit+expire cycles") {
    // the floor's whole purpose: a streaming-style table that commits
    // and expires forever must not accumulate one tombstone per version
    val dir = mkTable("bound", commits = 3) // v1..v4
    def mdFiles() = {
      val md = TableMetadata.metadataDir(dir)
      graft.catalog.Fs.children(md).iterator
        .count(_.getFileName.toString.matches("v\\d+\\.json"))
    }
    (1 to 5).foreach { c =>
      (0 until 5).map(i => (1000 + c * 10 + i, s"b$c-$i")).toDF("k", "v")
        .createOrReplaceTempView("mrob_src_bound2")
      spark.sql("INSERT INTO lakehouse.mrob_ns.bound SELECT * FROM mrob_src_bound2")
      Maintenance.expireSnapshots(spark, "lakehouse", Seq("mrob_ns"), "bound",
        retainVersions = 2, manifestGraceMs = 0L)
      // retained window (2) — never the full history of 4+c versions
      mdFiles() should be <= 3
    }
    spark.table("lakehouse.mrob_ns.bound").count() shouldBe 55
    spark.sql("DROP TABLE lakehouse.mrob_ns.bound")
  }

  test("the no-hardlink claim fallback is create-exclusive and cleans a failed copy") {
    val md = Files.createTempDirectory("mrob-claim")
    val tmp = md.resolve("payload.tmp")
    Files.writeString(tmp, """{"version":1,"x":"y"}""")
    val target = md.resolve("v1.json")
    TableMetadata.copyExclusive(target, tmp)
    Files.readString(target) shouldBe """{"version":1,"x":"y"}"""
    // a second claim of the same slot must refuse, never replace
    Files.writeString(tmp, """{"version":1,"x":"LOSER"}""")
    intercept[java.nio.file.FileAlreadyExistsException] {
      TableMetadata.copyExclusive(target, tmp)
    }
    Files.readString(target) shouldBe """{"version":1,"x":"y"}"""
    // a failed copy (missing source) leaves NO partial target claiming
    // the slot — a truncated payload parked there would brick retries
    intercept[Exception] {
      TableMetadata.copyExclusive(md.resolve("v2.json"), md.resolve("absent.tmp"))
    }
    Files.exists(md.resolve("v2.json")) shouldBe false
  }

  test("identity mint mark refuses to advance over unverifiable footer stats") {
    val schema = new StructType().add("id", LongType).add("v", LongType)
    val props = Map(
      IdentityColumns.SpecPrefix + "id" -> IdentityColumns.IdSpec(1, 1, true).encoded)
    // a stats-disabled foreign file (add_files) with rows but no range:
    // skipping it would leave the mark behind its ids and the next
    // INSERT would re-mint them as silent duplicates
    val e = intercept[IllegalStateException] {
      IdentityColumns.committedExtreme(schema, props,
        newStats = Map("data/c/a.parquet" -> Map("v" -> ColumnRange("1", "9", Some(0)))),
        newRows = Map("data/c/a.parquet" -> 100L))
    }
    e.getMessage should include("no footer range for identity column")
    // a provably EMPTY file is fine — it holds no ids
    IdentityColumns.committedExtreme(schema, props,
      newStats = Map("data/c/empty.parquet" -> Map.empty),
      newRows = Map("data/c/empty.parquet" -> 0L)) shouldBe Map.empty
    // a verifiable file advances normally
    IdentityColumns.committedExtreme(schema, props,
      newStats = Map("data/c/b.parquet" ->
        Map("id" -> ColumnRange("5", "42", Some(0)))),
      newRows = Map("data/c/b.parquet" -> 38L)) shouldBe Map("id" -> 42L)
  }

  test("the expire floor is monotone under racing advances; a stale smaller value never regresses it") {
    val md = Files.createTempDirectory("floor-race")
    // sequential stale writer: already-larger floor wins
    TableMetadata.writeFloor(md, 100)
    TableMetadata.writeFloor(md, 50)
    TableMetadata.readFloor(md) shouldBe 100
    // hammer: 16 threads × shuffled values interleaving read-compare-move.
    // The pre-fix check-then-act window (read stale → REPLACE_EXISTING
    // over a larger racer → own re-read exits) regresses the floor here;
    // the lock-serialized advance cannot.
    val values = scala.util.Random.shuffle((101 to 400).toVector)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(16)
    try {
      values.map(v => pool.submit(new Runnable {
        def run(): Unit = TableMetadata.writeFloor(md, v)
      })).foreach(_.get())
    } finally pool.shutdown()
    TableMetadata.readFloor(md) shouldBe 400
  }

  test("re-parking a seed key adjusts the eviction counter by the delta, not double-counts") {
    Manifests.clearCacheForTesting()
    def entry(i: Int) = ManifestEntry(s"data/c/p$i.parquet", Some(1L), 0, Map.empty)
    Manifests.parkSeed("repark-key", (0 until 3).map(entry))
    Manifests.pendingEntriesForTesting shouldBe 3L
    // same key re-parked with MORE entries: the map holds 5, the
    // counter must say 5 (the pre-fix code left it at 3 — the eviction
    // bound would drift loose by the difference forever)
    Manifests.parkSeed("repark-key", (0 until 5).map(entry))
    Manifests.pendingEntriesForTesting shouldBe 5L
    // and with FEWER: counter shrinks with the map
    Manifests.parkSeed("repark-key", (0 until 2).map(entry))
    Manifests.pendingEntriesForTesting shouldBe 2L
    Manifests.clearCacheForTesting()
  }

  test("a legacy txnId watermark blocks replay after the hash-scheme migration") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.mrob_ns")
    spark.sql("CREATE TABLE lakehouse.mrob_ns.legtxn (k INT, v STRING)")
    // the pre-migration id committed batches 0..3 (its watermark is 3)
    spark.sql(
      "ALTER TABLE lakehouse.mrob_ns.legtxn SET TBLPROPERTIES ('graft.txn.oldhash'='3')")
    val batch = Seq((1, "a"), (2, "b")).toDF("k", "v")
    // post-upgrade replay of batch 2 under the NEW id: the legacy
    // watermark must be honored — without the probe this double-writes
    Maintenance.transactionalAppend(spark, "lakehouse", Seq("mrob_ns"), "legtxn",
      batch, "newhash", 2L, Some("oldhash")) shouldBe false
    spark.table("lakehouse.mrob_ns.legtxn").count() shouldBe 0
    // a genuinely new batch (above both watermarks) commits normally
    Maintenance.transactionalAppend(spark, "lakehouse", Seq("mrob_ns"), "legtxn",
      batch, "newhash", 4L, Some("oldhash")) shouldBe true
    spark.table("lakehouse.mrob_ns.legtxn").count() shouldBe 2
    // and ITS replay is caught by the new id's own watermark
    Maintenance.transactionalAppend(spark, "lakehouse", Seq("mrob_ns"), "legtxn",
      batch, "newhash", 4L, Some("oldhash")) shouldBe false
    spark.table("lakehouse.mrob_ns.legtxn").count() shouldBe 2
    spark.sql("DROP TABLE lakehouse.mrob_ns.legtxn")
  }

  test("streaming chunk parse: old-parser tolerance kept, corrupt numerics fail loudly") {
    val tmp = Paths.get("/tmp/parse-chunk-probe.json") // name only used in errors
    def parse(json: String) = Manifests.parseChunk(json, tmp)

    // the writer's exact shape round-trips, including allNull ranges,
    // numeric min/max (older writers), and unknown fields (forward compat)
    val es = parse(
      """{"future_field": {"x": 1}, "entries": [
        |  {"path": "data/c1/a.parquet", "seq": 2, "rows": 7,
        |   "stats": {"k": {"min": "1", "max": "9", "nulls": 0},
        |             "s": {"allNull": true, "nulls": 7},
        |             "n": {"min": 4, "max": 5}},
        |   "unknown": [1, 2, {"y": 3}]},
        |  {"path": "data/c1/b.parquet", "seq": 3}
        |]}""".stripMargin)
    es.size shouldBe 2
    es.head shouldBe ManifestEntry("data/c1/a.parquet", Some(7L), 2, Map(
      "k" -> ColumnRange("1", "9", Some(0L)),
      "s" -> ColumnRange("", "", Some(7L), hasValues = false),
      "n" -> ColumnRange("4", "5", None)))
    es(1) shouldBe ManifestEntry("data/c1/b.parquet", None, 3, Map.empty)
    // non-object stats tolerated as empty (the retired parser's behavior)
    parse("""{"entries": [{"path": "p", "seq": 1, "stats": null}]}""")
      .head.stats shouldBe empty

    // corrupt numerics must fail LOUDLY, never default to 0 — a
    // defaulted seq=0 silently breaks MoR delete applicability
    an[Exception] should be thrownBy
      parse("""{"entries": [{"path": "p", "seq": "junk"}]}""")
    an[Exception] should be thrownBy
      parse("""{"entries": [{"path": "p"}]}""") // seq missing entirely
    an[Exception] should be thrownBy
      parse("""{"entries": [{"path": "p", "seq": 1, "rows": null}]}""")
    an[Exception] should be thrownBy
      parse("""{"entries": [{"seq": 1}]}""") // path missing
    an[Exception] should be thrownBy parse("""{"no_entries": []}""")
    an[Exception] should be thrownBy parse("""not json""")
  }
}
