package graft

import java.nio.file.Paths

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.catalog.{DeleteFile, Maintenance, MergeOnRead, Snapshot, TableMetadata}

/** Optimistic commit rebase ([[TableMetadata.commitOrRebase]]): the
  * multi-writer story. Deterministic interleaves are staged at the
  * metadata level (compute an attempt against a base, let a racer
  * commit, then publish); the threaded tests drive the public API under
  * real contention. */
class CommitRebaseSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tableDir(ns: String, t: String) = Paths.get(TestSpark.warehouse, ns, t)

  /** A lakehouse table with three append commits of 100 rows each,
    * disjoint k ranges. Returns its directory. */
  private def mkTable(name: String): java.nio.file.Path = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.race_ns")
    spark.sql(s"CREATE TABLE lakehouse.race_ns.$name (k INT, v STRING)")
    (0 until 3).foreach { c =>
      (0 until 100).map(i => (c * 100 + i, s"v$c-$i")).toDF("k", "v")
        .createOrReplaceTempView(s"rb_src_$name")
      spark.sql(s"INSERT INTO lakehouse.race_ns.$name SELECT * FROM rb_src_$name")
    }
    tableDir("race_ns", name)
  }

  test("interleaved appends: the loser rebases and both files land") {
    val dir = mkTable("a1")
    val base = TableMetadata.load(dir)
    // writer A commits first
    TableMetadata.commit(dir, base.copy(
      version = base.version + 1,
      files = base.files :+ "data/x-racer/p0.parquet",
      snapshots = base.snapshots :+
        Snapshot(base.version + 1, 1L, "append", 1, base.files.size + 1)))
    // writer B computed against the SAME base: must rebase, not fail
    val committed = TableMetadata.commitOrRebase(dir, base = base, attempt = base.copy(
      version = base.version + 1,
      files = base.files :+ "data/x-loser/p0.parquet",
      snapshots = base.snapshots :+
        Snapshot(base.version + 1, 2L, "append", 1, base.files.size + 1)))
    committed.version shouldBe base.version + 2
    committed.files should contain allOf ("data/x-racer/p0.parquet", "data/x-loser/p0.parquet")
    base.files.foreach(f => committed.files should contain(f))
    // the rebased snapshot entry carries the new version and total
    committed.snapshots.last.version shouldBe base.version + 2
    committed.snapshots.last.totalFiles shouldBe base.files.size + 2
    TableMetadata.load(dir).files should contain theSameElementsAs committed.files
    spark.sql("DROP TABLE lakehouse.race_ns.a1")
  }

  test("rewrite rebases onto a concurrent append; racing rewrites fail clean") {
    val dir = mkTable("r1")
    val base = TableMetadata.load(dir)
    val (f1, rest) = (base.files.head, base.files.tail)
    // racer appends
    TableMetadata.commit(dir, base.copy(
      version = base.version + 1,
      files = base.files :+ "data/x-app/p0.parquet",
      snapshots = base.snapshots :+
        Snapshot(base.version + 1, 1L, "append", 1, base.files.size + 1)))
    // compact-shaped attempt computed against base: replaces f1 with c1
    val committed = TableMetadata.commitOrRebase(dir, base = base, attempt = base.copy(
      version = base.version + 1,
      files = rest :+ "data/x-rw/c1.parquet",
      snapshots = base.snapshots :+
        Snapshot(base.version + 1, 2L, "rewrite", 1, base.files.size)))
    committed.files should contain theSameElementsAs
      (rest ++ Seq("data/x-app/p0.parquet", "data/x-rw/c1.parquet"))

    // a second rewrite still computed against the ORIGINAL base races
    // the first rewrite: both touch files — must fail, not lose updates
    val e = intercept[IllegalStateException] {
      TableMetadata.commitOrRebase(dir, base = base, attempt = base.copy(
        version = base.version + 1,
        files = rest :+ "data/x-rw2/c2.parquet",
        snapshots = base.snapshots :+
          Snapshot(base.version + 1, 3L, "rewrite", 1, base.files.size)))
    }
    e.getMessage should include("do not commute")
    spark.sql("DROP TABLE lakehouse.race_ns.r1")
  }

  test("rebased delete entry keeps its sequence: racer's appended rows stay live") {
    val dir = mkTable("d1")
    val base = TableMetadata.load(dir)
    // racer appends a file (gets seq = base.version + 1 structurally)
    TableMetadata.commit(dir, base.copy(
      version = base.version + 1,
      files = base.files :+ "data/x-app/p0.parquet",
      snapshots = base.snapshots :+
        Snapshot(base.version + 1, 1L, "append", 1, base.files.size + 1)))
    // mor-delete attempt computed against base: entry seq = base.version + 1
    val entry = DeleteFile("deletes/x/k.parquet", Seq("k"), base.version + 1, 5L)
    val committed = TableMetadata.commitOrRebase(dir, base = base, attempt = base.copy(
      version = base.version + 1,
      deleteFiles = base.deleteFiles :+ entry,
      snapshots = base.snapshots :+
        Snapshot(base.version + 1, 2L, "mor-delete", 0, base.files.size)))
    committed.version shouldBe base.version + 2
    committed.deleteFiles.map(_.seq) should contain(base.version + 1) // PRESERVED
    // applies to every base file (seq <= base.version), never the racer's
    base.files.foreach { f =>
      MergeOnRead.applicable(committed, f) should not be empty
    }
    MergeOnRead.applicable(committed, "data/x-app/p0.parquet") shouldBe empty
    spark.sql("DROP TABLE lakehouse.race_ns.d1")
  }

  test("rebased upsert re-sequences its delete entry: racing upserts keep the key unique") {
    val dir = mkTable("u1")
    val base = TableMetadata.load(dir)
    // racer upsert commits first: one data file + its delete entry at seq v+1
    TableMetadata.commit(dir, base.copy(
      version = base.version + 1,
      files = base.files :+ "data/x-ups-a/p0.parquet",
      deleteFiles = base.deleteFiles :+
        DeleteFile("deletes/x-a/k.parquet", Seq("k"), base.version + 1, 1L),
      snapshots = base.snapshots :+
        Snapshot(base.version + 1, 1L, "mor-upsert", 1, base.files.size + 1)))
    // loser upsert of the SAME key computed against the same base: were
    // its entry seq preserved (as plain deletes are), neither delete
    // would cover the other's appended file and the key would duplicate
    val committed = TableMetadata.commitOrRebase(dir, base = base, attempt = base.copy(
      version = base.version + 1,
      files = base.files :+ "data/x-ups-b/p0.parquet",
      deleteFiles = base.deleteFiles :+
        DeleteFile("deletes/x-b/k.parquet", Seq("k"), base.version + 1, 1L),
      snapshots = base.snapshots :+
        Snapshot(base.version + 1, 2L, "mor-upsert", 1, base.files.size + 1)))
    committed.version shouldBe base.version + 2
    val loser = committed.deleteFiles.find(_.path == "deletes/x-b/k.parquet").get
    loser.seq shouldBe base.version + 2 // RE-SEQUENCED to the rebased commit
    // covers the racer's concurrently-appended file (key uniqueness)...
    MergeOnRead.applicable(committed, "data/x-ups-a/p0.parquet") should contain(loser)
    // ...but never the loser's own appended rows
    MergeOnRead.applicable(committed, "data/x-ups-b/p0.parquet") should not contain loser
    spark.sql("DROP TABLE lakehouse.race_ns.u1")
  }

  test("concurrent upserts of the same key leave exactly one row") {
    mkTable("u2")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val writers = (0 until 4).map { w =>
      Future {
        MergeOnRead.morUpsert(spark, "lakehouse", Seq("race_ns"), "u2",
          Seq((7, s"writer-$w")).toDF("k", "v"), Seq("k"))
      }
    }
    Await.result(Future.sequence(writers), 120.seconds)
    // whichever writer committed last wins; the key is never duplicated
    spark.table("lakehouse.race_ns.u2").where($"k" === 7).count() shouldBe 1
    spark.table("lakehouse.race_ns.u2").count() shouldBe 300
    spark.sql("DROP TABLE lakehouse.race_ns.u2")
  }

  test("file-adding commit never rebases over a concurrently-added CHECK/generation property") {
    val dir = mkTable("c1")
    val base = TableMetadata.load(dir)
    // racer: ADD CONSTRAINT lands first (property-only commit) — its
    // declaration-time verification saw only base's files
    TableMetadata.commit(dir, base.copy(
      version = base.version + 1,
      properties = base.properties + ("graft.check.pos" -> "k >= 0"),
      snapshots = base.snapshots :+
        Snapshot(base.version + 1, 1L, "alter", 0, base.files.size)))
    // loser: an append computed against base (its rows were never
    // verified against the new constraint) must NOT auto-rebase —
    // add_files / MoR DML / streaming epochs all ride this decline
    val attempt = base.copy(
      version = base.version + 1,
      files = base.files :+ "data/x-unverified/p0.parquet",
      snapshots = base.snapshots :+
        Snapshot(base.version + 1, 2L, "append", 1, base.files.size + 1))
    val e = intercept[IllegalStateException] {
      TableMetadata.commitOrRebase(dir, base = base, attempt = attempt)
    }
    e.getMessage should include("do not commute")
    // a racing GENERATION property declines the same way
    val base2 = TableMetadata.load(dir)
    TableMetadata.commit(dir, base2.copy(
      version = base2.version + 1,
      properties = base2.properties + ("graft.generated.g" -> "k * 2"),
      snapshots = base2.snapshots :+
        Snapshot(base2.version + 1, 3L, "alter", 0, base2.files.size)))
    intercept[IllegalStateException] {
      TableMetadata.commitOrRebase(dir, base = base2, attempt = base2.copy(
        version = base2.version + 1,
        files = base2.files :+ "data/x-unverified/p1.parquet",
        snapshots = base2.snapshots :+
          Snapshot(base2.version + 1, 4L, "append", 1, base2.files.size + 1)))
    }.getMessage should include("do not commute")
    // but a racing NON-constraint property still commutes with appends
    val base3 = TableMetadata.load(dir)
    TableMetadata.commit(dir, base3.copy(
      version = base3.version + 1,
      properties = base3.properties + ("graft.note" -> "hi"),
      snapshots = base3.snapshots :+
        Snapshot(base3.version + 1, 4L, "alter", 0, base3.files.size)))
    val committed = TableMetadata.commitOrRebase(dir, base = base3, attempt = base3.copy(
      version = base3.version + 1,
      files = base3.files :+ "data/x-ok/p0.parquet",
      snapshots = base3.snapshots :+
        Snapshot(base3.version + 1, 5L, "append", 1, base3.files.size + 1)))
    committed.files should contain("data/x-ok/p0.parquet")
    committed.properties("graft.note") shouldBe "hi"
    // and a delete-only commit (no new rows) commutes with the new
    // constraint — deletions cannot violate a CHECK
    val base4 = TableMetadata.load(dir)
    TableMetadata.commit(dir, base4.copy(
      version = base4.version + 1,
      properties = base4.properties + ("graft.check.neg" -> "k < 1000000"),
      snapshots = base4.snapshots :+
        Snapshot(base4.version + 1, 6L, "alter", 0, base4.files.size)))
    val delCommitted = TableMetadata.commitOrRebase(dir, base = base4, attempt = base4.copy(
      version = base4.version + 1,
      deleteFiles = base4.deleteFiles :+
        DeleteFile("deletes/d0.parquet", Seq("k"), base4.version + 1, 1L),
      snapshots = base4.snapshots :+
        Snapshot(base4.version + 1, 7L, "delete", 0, base4.files.size)))
    delCommitted.deleteFiles.map(_.path) should contain("deletes/d0.parquet")
    spark.sql("DROP TABLE lakehouse.race_ns.c1")
  }

  test("property-only commit rebases; schema change racing anything does not") {
    val dir = mkTable("p1")
    val base = TableMetadata.load(dir)
    TableMetadata.commit(dir, base.copy(
      version = base.version + 1,
      files = base.files :+ "data/x-app/p0.parquet",
      snapshots = base.snapshots :+
        Snapshot(base.version + 1, 1L, "append", 1, base.files.size + 1)))
    val committed = TableMetadata.commitOrRebase(dir, base = base, attempt = base.copy(
      version = base.version + 1,
      properties = base.properties + ("graft.stats.numRows" -> "300"),
      snapshots = base.snapshots :+
        Snapshot(base.version + 1, 2L, "analyze", 0, base.files.size)))
    committed.properties("graft.stats.numRows") shouldBe "300"
    committed.files should contain("data/x-app/p0.parquet") // racer kept

    // schema evolution never auto-rebases
    val cur = TableMetadata.load(dir)
    TableMetadata.commit(dir, cur.copy(
      version = cur.version + 1,
      snapshots = cur.snapshots :+ Snapshot(cur.version + 1, 3L, "append", 0, cur.files.size)))
    val e = intercept[IllegalStateException] {
      TableMetadata.commitOrRebase(dir, base = cur, attempt = cur.copy(
        version = cur.version + 1,
        schema = org.apache.spark.sql.types.StructType(cur.schema.fields :+
          org.apache.spark.sql.types.StructField("extra", org.apache.spark.sql.types.IntegerType)),
        snapshots = cur.snapshots :+ Snapshot(cur.version + 1, 4L, "alter", 0, cur.files.size)))
    }
    e.getMessage should include("commit conflict")
    spark.sql("DROP TABLE lakehouse.race_ns.p1")
  }

  test("ALTER re-derives against the fresh snapshot when racing appends") {
    mkTable("alt1")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // schema DDL races a burst of appends: the ALTER must re-fold and
    // land, never fail the user's DDL on a mechanical version conflict
    val appender = Future {
      (0 until 4).foreach { i =>
        Seq((800 + i, s"race-$i")).toDF("k", "v").createOrReplaceTempView(s"alt_app_$i")
        // explicit column list: the racing DDL may add a column mid-burst
        spark.sql(s"INSERT INTO lakehouse.race_ns.alt1 (k, v) SELECT * FROM alt_app_$i")
      }
    }
    val alterer = Future {
      spark.sql("ALTER TABLE lakehouse.race_ns.alt1 ADD COLUMN extra BIGINT")
    }
    Await.result(Future.sequence(Seq(appender.map(_ => ()), alterer.map(_ => ()))),
      120.seconds)
    spark.table("lakehouse.race_ns.alt1").columns should contain("extra")
    spark.table("lakehouse.race_ns.alt1").count() shouldBe 304 // nothing lost

    // a SEMANTIC race still fails clean: the column now exists
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE lakehouse.race_ns.alt1 ADD COLUMN extra BIGINT")
    }
    e.getMessage should (include("already exists") or include("FIELD_ALREADY_EXISTS"))
    spark.sql("DROP TABLE lakehouse.race_ns.alt1")
  }

  test("concurrent mor-deletes all succeed under real contention") {
    mkTable("t1")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val writers = (0 until 4).map { w =>
      Future {
        MergeOnRead.morDelete(spark, "lakehouse", Seq("race_ns"), "t1",
          (w * 10 until w * 10 + 5).toDF("k"))
      }
    }
    Await.result(Future.sequence(writers), 120.seconds) shouldBe Seq(5L, 5L, 5L, 5L)
    spark.table("lakehouse.race_ns.t1").count() shouldBe 280
    spark.sql("SELECT * FROM lakehouse.race_ns.t1.delete_files").count() shouldBe 4
    spark.sql("DROP TABLE lakehouse.race_ns.t1")
  }

  test("consolidation racing an append: both land, merged entry stays inapplicable to the new file") {
    val dir = mkTable("c1")
    import scala.jdk.CollectionConverters._
    // two pending equality entries, then a consolidation computed
    // against this base
    MergeOnRead.morDeleteAt(spark, dir, Seq(10).toDF("k"))
    MergeOnRead.morDeleteAt(spark, dir, Seq(20).toDF("k"))
    val base = TableMetadata.load(dir)
    base.deleteFiles.size shouldBe 2

    // hand-build the consolidation ATTEMPT against this base (what
    // consolidateDeletesAt would commit): one merged parquet holding
    // both key tuples, seq = max of the superseded entries
    val sch = MergeOnRead.keySchema(base.schema, Seq("k"))
    val mergedRel = "deletes/manual-merged"
    spark.read.schema(sch)
      .parquet(base.deleteFiles.map(e => dir.resolve(e.path).toString): _*)
      .distinct().coalesce(1).write.parquet(dir.resolve(mergedRel).toString)
    val mergedFile = java.nio.file.Files.list(dir.resolve(mergedRel)).iterator()
      .asScala.map(_.getFileName.toString).filter(_.endsWith(".parquet")).toSeq.head
    val merged = graft.catalog.DeleteFile(s"$mergedRel/$mergedFile", Seq("k"),
      base.deleteFiles.map(_.seq).max, 2)
    val attempt = base.copy(
      version = base.version + 1,
      deleteFiles = Seq(merged),
      snapshots = base.snapshots :+ Snapshot(
        base.version + 1, 1L, "consolidate-deletes", 0, base.files.size))

    // a racer append lands FIRST — the consolidation must rebase onto
    // it, not fail and not lose either change
    Seq((900, "racer")).toDF("k", "v").createOrReplaceTempView("rb_c1_racer")
    spark.sql("INSERT INTO lakehouse.race_ns.c1 SELECT * FROM rb_c1_racer")
    val committed = TableMetadata.commitOrRebase(dir, attempt = attempt, base = base)
    committed.version shouldBe base.version + 2

    val after = TableMetadata.load(dir)
    after.deleteFiles.map(_.path) shouldBe Seq(merged.path)
    // the racer's row is alive, deleted keys stay dead, counts exact
    spark.table("lakehouse.race_ns.c1").where($"k" === 900).count() shouldBe 1
    spark.table("lakehouse.race_ns.c1").where($"k" === 10 || $"k" === 20).count() shouldBe 0
    spark.table("lakehouse.race_ns.c1").count() shouldBe 299
    // seq argument: the merged entry's seq predates the racer's file,
    // so it can never apply to it — same as each original entry
    val racerFile = after.files.filterNot(base.files.contains).head
    after.deleteFiles.head.seq should be < after.seqOf(racerFile)
    spark.sql("DROP TABLE lakehouse.race_ns.c1")
  }

  test("compact racing an append: both succeed, nothing lost") {
    mkTable("c1")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val appender = Future {
      (0 until 3).foreach { i =>
        Seq((900 + i, s"late-$i")).toDF("k", "v").createOrReplaceTempView(s"rb_app_$i")
        spark.sql(s"INSERT INTO lakehouse.race_ns.c1 SELECT * FROM rb_app_$i")
      }
    }
    val compactor = Future {
      Maintenance.compact(spark, "lakehouse", Seq("race_ns"), "c1", targetFiles = 1)
    }
    Await.result(Future.sequence(Seq(appender.map(_ => ()), compactor.map(_ => ()))),
      120.seconds)
    // every original and every late row present exactly once
    spark.table("lakehouse.race_ns.c1").count() shouldBe 303
    spark.table("lakehouse.race_ns.c1").where($"k" >= 900).count() shouldBe 3
    spark.table("lakehouse.race_ns.c1").select("v").distinct().count() shouldBe 303
    spark.sql("DROP TABLE lakehouse.race_ns.c1")
  }

  // --- mixed-kind delete races: positional and equality entries name
  // --- incomparable targets (paths vs key values), so row overlap can
  // --- never be refuted and the rebase must refuse, not guess

  private def eqDel(path: String, seq: Int, paired: Boolean = false) =
    DeleteFile(path, Seq("k"), seq, 1, paired = paired)
  private def posDel(path: String, seq: Int, fileRange: (String, String)) =
    DeleteFile(path, Seq(DeleteFile.PosFileCol, DeleteFile.PosPosCol), seq, 1,
      keyRanges = Map(DeleteFile.PosFileCol ->
        graft.catalog.ColumnRange(fileRange._1, fileRange._2)),
      kind = DeleteFile.Positional)

  test("positional UPDATE never rebases over a racer's equality delete") {
    val dir = mkTable("mk1")
    val base = TableMetadata.load(dir)
    // racer: plain equality DELETE (no files) — its committed entry
    // cannot cover the attempt's replacement rows, so the deleted row
    // would resurrect carrying the update
    TableMetadata.commit(dir, base.copy(
      version = base.version + 1,
      deleteFiles = base.deleteFiles :+ eqDel("deletes/r-eq/d0.parquet", base.version + 1),
      snapshots = base.snapshots :+
        Snapshot(base.version + 1, 1L, "delete", 0, base.files.size)))
    val e = intercept[IllegalStateException] {
      TableMetadata.commitOrRebase(dir, base = base, attempt = base.copy(
        version = base.version + 1,
        files = base.files :+ "data/x-upd/u0.parquet",
        deleteFiles = base.deleteFiles :+
          posDel("deletes/a-pos/d0.parquet", base.version + 1,
            (base.files.head, base.files.head)),
        snapshots = base.snapshots :+
          Snapshot(base.version + 1, 2L, "update", 1, base.files.size + 1)))
    }
    e.getMessage should include("do not commute")
    spark.sql("DROP TABLE lakehouse.race_ns.mk1")
  }

  test("plain equality DELETE never rebases over a racer that replaced rows") {
    val dir = mkTable("mk2")
    val base = TableMetadata.load(dir)
    // racer: equality upsert (delete entries + replacement files) —
    // its replacement row for a matched key escapes the attempt's
    // preserved-seq delete, so the "deleted" row would survive
    TableMetadata.commit(dir, base.copy(
      version = base.version + 1,
      files = base.files :+ "data/x-ups/u0.parquet",
      deleteFiles = base.deleteFiles :+
        eqDel("deletes/r-ups/d0.parquet", base.version + 1, paired = true),
      snapshots = base.snapshots :+
        Snapshot(base.version + 1, 1L, "upsert", 1, base.files.size + 1)))
    val e = intercept[IllegalStateException] {
      TableMetadata.commitOrRebase(dir, base = base, attempt = base.copy(
        version = base.version + 1,
        deleteFiles = base.deleteFiles :+ eqDel("deletes/a-del/d0.parquet", base.version + 1),
        snapshots = base.snapshots :+
          Snapshot(base.version + 1, 2L, "delete", 0, base.files.size)))
    }
    e.getMessage should include("do not commute")
    spark.sql("DROP TABLE lakehouse.race_ns.mk2")
  }

  test("plain equality DELETE still commutes with a pure append") {
    val dir = mkTable("mk3")
    val base = TableMetadata.load(dir)
    TableMetadata.commit(dir, base.copy(
      version = base.version + 1,
      files = base.files :+ "data/x-app2/p0.parquet",
      snapshots = base.snapshots :+
        Snapshot(base.version + 1, 1L, "append", 1, base.files.size + 1)))
    // snapshot isolation: the delete applies to the rows its writer
    // saw; a racer's genuinely new rows are out of scope
    val committed = TableMetadata.commitOrRebase(dir, base = base, attempt = base.copy(
      version = base.version + 1,
      deleteFiles = base.deleteFiles :+ eqDel("deletes/a-del3/d0.parquet", base.version + 1),
      snapshots = base.snapshots :+
        Snapshot(base.version + 1, 2L, "delete", 0, base.files.size)))
    committed.version shouldBe base.version + 2
    committed.deleteFiles.map(_.path) should contain("deletes/a-del3/d0.parquet")
    spark.sql("DROP TABLE lakehouse.race_ns.mk3")
  }

  test("delete CONSOLIDATION commutes with racing DML: merged entries are rewrites, not deletions") {
    val dir = mkTable("mk5")
    val base0 = TableMetadata.load(dir)
    // set up a base that CARRIES delete entries (two plain equality deletes)
    val withDels = TableMetadata.commit(dir, base0.copy(
      version = base0.version + 1,
      deleteFiles = base0.deleteFiles ++ Seq(
        eqDel("deletes/old/d0.parquet", base0.version + 1),
        eqDel("deletes/old/d1.parquet", base0.version + 1)),
      snapshots = base0.snapshots :+
        Snapshot(base0.version + 1, 1L, "delete", 0, base0.files.size)))
    val base = TableMetadata.load(dir)
    // racer: consolidation — replaces the two entries with ONE merged
    // entry recording its components; no row's deletion state changes
    val merged = DeleteFile("deletes/consol/m0.parquet", Seq("k"),
      seq = withDels.deleteFiles.map(_.seq).max, rows = 2,
      components = Seq("deletes/old/d0.parquet", "deletes/old/d1.parquet"))
    TableMetadata.commit(dir, base.copy(
      version = base.version + 1,
      deleteFiles = base.deleteFiles.filterNot(d =>
        d.path.startsWith("deletes/old/")) :+ merged,
      snapshots = base.snapshots :+
        Snapshot(base.version + 1, 2L, "consolidate-deletes", 0, base.files.size)))
    // attempt 1: positional UPDATE (files + positional dels) — must
    // rebase cleanly over the consolidation (the r12 guard refused it)
    val committed = TableMetadata.commitOrRebase(dir, base = base, attempt = base.copy(
      version = base.version + 1,
      files = base.files :+ "data/x-upd5/u0.parquet",
      deleteFiles = base.deleteFiles :+
        posDel("deletes/a-pos5/d0.parquet", base.version + 1,
          (base.files.head, base.files.head)),
      snapshots = base.snapshots :+
        Snapshot(base.version + 1, 3L, "update", 1, base.files.size + 1)))
    committed.files should contain("data/x-upd5/u0.parquet")
    committed.deleteFiles.map(_.path) should contain("deletes/consol/m0.parquet")
    // attempt 2 (fresh base): plain equality DELETE must also commute
    // with a consolidation racer (entry-identity comparison would not)
    val base2 = TableMetadata.load(dir)
    TableMetadata.commit(dir, base2.copy(
      version = base2.version + 1,
      deleteFiles = base2.deleteFiles.filterNot(_.path == "deletes/consol/m0.parquet") :+
        merged.copy(path = "deletes/consol/m1.parquet"),
      snapshots = base2.snapshots :+
        Snapshot(base2.version + 1, 4L, "consolidate-deletes", 0, base2.files.size)))
    val committed2 = TableMetadata.commitOrRebase(dir, base = base2, attempt = base2.copy(
      version = base2.version + 1,
      deleteFiles = base2.deleteFiles :+ eqDel("deletes/a-del5/d9.parquet", base2.version + 1),
      snapshots = base2.snapshots :+
        Snapshot(base2.version + 1, 5L, "delete", 0, base2.files.size)))
    committed2.deleteFiles.map(_.path) should contain("deletes/a-del5/d9.parquet")
    spark.sql("DROP TABLE lakehouse.race_ns.mk5")
  }

  test("a merged entry CARRYING a fresh component still refuses mixed-kind rebase") {
    val dir = mkTable("mk6")
    val base = TableMetadata.load(dir)
    // racer: one commit that consolidates while ALSO absorbing a new
    // plain delete the base never saw — the merged entry carries a
    // component outside the base's row paths, so it IS a fresh deletion
    val merged = DeleteFile("deletes/consol6/m0.parquet", Seq("k"),
      seq = base.version + 1, rows = 1,
      components = Seq("deletes/new6/d0.parquet"))
    TableMetadata.commit(dir, base.copy(
      version = base.version + 1,
      deleteFiles = base.deleteFiles :+ merged,
      snapshots = base.snapshots :+
        Snapshot(base.version + 1, 1L, "delete", 0, base.files.size)))
    val e = intercept[IllegalStateException] {
      TableMetadata.commitOrRebase(dir, base = base, attempt = base.copy(
        version = base.version + 1,
        files = base.files :+ "data/x-upd6/u0.parquet",
        deleteFiles = base.deleteFiles :+
          posDel("deletes/a-pos6/d0.parquet", base.version + 1,
            (base.files.head, base.files.head)),
        snapshots = base.snapshots :+
          Snapshot(base.version + 1, 2L, "update", 1, base.files.size + 1)))
    }
    e.getMessage should include("do not commute")
    spark.sql("DROP TABLE lakehouse.race_ns.mk6")
  }

  test("positional plain deletes with provably disjoint file ranges still commute") {
    val dir = mkTable("mk4")
    val base = TableMetadata.load(dir)
    val (fa, fb) = (base.files.min, base.files.max)
    fa should not be fb
    TableMetadata.commit(dir, base.copy(
      version = base.version + 1,
      deleteFiles = base.deleteFiles :+ posDel("deletes/r-p4/d0.parquet", base.version + 1, (fa, fa)),
      snapshots = base.snapshots :+
        Snapshot(base.version + 1, 1L, "delete", 0, base.files.size)))
    // disjoint path ranges ARE a row-disjointness proof: different
    // files, different rows — the mixed-kind guard must not regress it
    val committed = TableMetadata.commitOrRebase(dir, base = base, attempt = base.copy(
      version = base.version + 1,
      deleteFiles = base.deleteFiles :+ posDel("deletes/a-p4/d0.parquet", base.version + 1, (fb, fb)),
      snapshots = base.snapshots :+
        Snapshot(base.version + 1, 2L, "delete", 0, base.files.size)))
    committed.deleteFiles.map(_.path) should contain allOf
      ("deletes/r-p4/d0.parquet", "deletes/a-p4/d0.parquet")
    spark.sql("DROP TABLE lakehouse.race_ns.mk4")
  }
}
