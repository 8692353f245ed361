package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.catalog.Maintenance

/** Writable branch refs — the write-audit-publish workflow: ingest
  * lands on a branch (main readers never see it), validation reads the
  * branch head via `VERSION AS OF '<branch>'`, and fastForward
  * publishes the branch's version files onto main's log. Tags stay
  * immutable pins; branches accept commits. */
class BranchSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tableDir(name: String): java.nio.file.Path =
    java.nio.file.Paths.get(TestSpark.warehouse, "br_ns", name)

  private def mkTable(name: String): Unit = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.br_ns")
    spark.sql(s"CREATE TABLE lakehouse.br_ns.$name (k INT, v STRING)")
    Seq((1, "a"), (2, "b")).toDF("k", "v").createOrReplaceTempView(s"br_src_$name")
    spark.sql(s"INSERT INTO lakehouse.br_ns.$name SELECT * FROM br_src_$name")
  }

  test("write-audit-publish: branch writes invisible to main until fast-forward") {
    mkTable("wap")
    val t = "lakehouse.br_ns.wap"
    spark.sql(s"CALL lakehouse.system.branch('br_ns', 'wap', 'audit')")
      .collect()(0).getLong(0) should be >= 2L

    // WRITE: two commits land on the branch
    Seq((10, "x"), (11, "y")).toDF("k", "v").createOrReplaceTempView("br_wap_w1")
    spark.sql("CALL lakehouse.system.append_to_branch('br_ns', 'wap', 'audit', 'br_wap_w1')")
      .collect()(0).getLong(0) shouldBe 2L
    Seq((12, "z")).toDF("k", "v").createOrReplaceTempView("br_wap_w2")
    Maintenance.appendToBranch(spark, "lakehouse", Seq("br_ns"), "wap", "audit",
      spark.table("br_wap_w2")) shouldBe 1L

    // main is untouched; the AUDIT read sees the branch head
    spark.table(t).count() shouldBe 2
    spark.sql(s"SELECT * FROM $t VERSION AS OF 'audit'").count() shouldBe 5
    spark.sql(s"SELECT v FROM $t VERSION AS OF 'audit' WHERE k = 12")
      .collect()(0).getString(0) shouldBe "z"

    // refs reports the branch at its own head, main at its own
    val refs = spark.sql(s"SELECT name, type, version FROM $t.refs")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toMap2
    refs(("audit", "branch")) shouldBe refs(("main", "head")) + 2

    // PUBLISH: fast-forward copies the branch versions onto main
    spark.sql("CALL lakehouse.system.fast_forward('br_ns', 'wap', 'audit')")
      .collect()(0).getLong(0).toInt shouldBe refs(("audit", "branch"))
    spark.table(t).count() shouldBe 5
    // the published versions time-travel like native main commits
    val headV = spark.sql(s"SELECT MAX(version) FROM $t.history").collect()(0).getInt(0)
    spark.sql(s"SELECT * FROM $t VERSION AS OF ${headV - 1}").count() shouldBe 4

    // repeated WAP cycle on the same branch still fast-forwards
    Seq((13, "w")).toDF("k", "v").createOrReplaceTempView("br_wap_w3")
    Maintenance.appendToBranch(spark, "lakehouse", Seq("br_ns"), "wap", "audit",
      spark.table("br_wap_w3"))
    Maintenance.fastForward(spark, "lakehouse", Seq("br_ns"), "wap", "audit")
    spark.table(t).count() shouldBe 6
    spark.sql(s"DROP TABLE $t")
  }

  test("fast-forward refuses a diverged main; drop-branch removes the ref") {
    mkTable("div")
    val t = "lakehouse.br_ns.div"
    Maintenance.createBranch(spark, "lakehouse", Seq("br_ns"), "div", "side")
    Seq((20, "s")).toDF("k", "v").createOrReplaceTempView("br_div_w")
    Maintenance.appendToBranch(spark, "lakehouse", Seq("br_ns"), "div", "side",
      spark.table("br_div_w"))

    // main advances OFF the branch lineage
    Seq((99, "main")).toDF("k", "v").createOrReplaceTempView("br_div_main")
    spark.sql(s"INSERT INTO $t SELECT * FROM br_div_main")

    val e = intercept[IllegalArgumentException] {
      Maintenance.fastForward(spark, "lakehouse", Seq("br_ns"), "div", "side")
    }
    e.getMessage should include("off the 'side' lineage")
    // main and the branch both keep their own rows
    spark.table(t).count() shouldBe 3
    spark.sql(s"SELECT * FROM $t VERSION AS OF 'side'").count() shouldBe 3
    spark.sql(s"SELECT * FROM $t VERSION AS OF 'side' WHERE k = 99").count() shouldBe 0

    Maintenance.dropBranch(spark, "lakehouse", Seq("br_ns"), "div", "side")
    intercept[Exception] {
      spark.sql(s"SELECT * FROM $t VERSION AS OF 'side'").collect()
    }
    spark.sql(s"SELECT name FROM $t.refs").collect()
      .map(_.getString(0)) should not contain "side"
    spark.sql(s"DROP TABLE $t")
  }

  test("vacuum keeps data files referenced only by a branch head") {
    mkTable("vac")
    val t = "lakehouse.br_ns.vac"
    Maintenance.createBranch(spark, "lakehouse", Seq("br_ns"), "vac", "wip")
    Seq((30, "k")).toDF("k", "v").createOrReplaceTempView("br_vac_w")
    Maintenance.appendToBranch(spark, "lakehouse", Seq("br_ns"), "vac", "wip",
      spark.table("br_vac_w"))
    // age every file out of the retention window, then vacuum hard
    Maintenance.vacuum(spark, "lakehouse", Seq("br_ns"), "vac",
      retainVersions = 1, retentionMs = -1L)
    // branch read still works: its files were not reaped as orphans
    spark.sql(s"SELECT * FROM $t VERSION AS OF 'wip'").count() shouldBe 3
    spark.table(t).count() shouldBe 2
    spark.sql(s"DROP TABLE $t")
  }

  test("branch-addressed MoR delete: audit-stage cleanup invisible to main until publish") {
    mkTable("del")
    val t = "lakehouse.br_ns.del"
    Maintenance.createBranch(spark, "lakehouse", Seq("br_ns"), "del", "stage")
    // staged ingest on the branch, then dedup-delete ON the branch
    Seq((1, "dup"), (30, "new")).toDF("k", "v").createOrReplaceTempView("br_del_w")
    Maintenance.appendToBranch(spark, "lakehouse", Seq("br_ns"), "del", "stage",
      spark.table("br_del_w"))
    Maintenance.morDeleteFromBranch(spark, "lakehouse", Seq("br_ns"), "del", "stage",
      Seq(1).toDF("k")) shouldBe 1L
    // the branch read merges the delete: k=1 gone (both the original
    // row and the staged duplicate), k=30 present; main untouched
    val audit = spark.sql(s"SELECT k FROM $t VERSION AS OF 'stage'")
      .collect().map(_.getInt(0)).sorted
    audit shouldBe Array(2, 30)
    spark.table(t).where($"k" === 1).count() shouldBe 1
    // publish: main now reflects append + delete in one fast-forward
    Maintenance.fastForward(spark, "lakehouse", Seq("br_ns"), "del", "stage")
    spark.table(t).where($"k" === 1).count() shouldBe 0
    spark.table(t).count() shouldBe 2
    // an empty key set is a clean no-op: nothing staged, no commit
    val headBefore = Maintenance.branchHead(tableDir("del"), "stage").version
    Maintenance.morDeleteFromBranch(spark, "lakehouse", Seq("br_ns"), "del", "stage",
      Seq.empty[Int].toDF("k")) shouldBe 0L
    Maintenance.branchHead(tableDir("del"), "stage").version shouldBe headBefore
    spark.sql(s"DROP TABLE $t")
  }

  test("expireSnapshots keeps the fork version of a commitless branch readable") {
    mkTable("exp")
    val t = "lakehouse.br_ns.exp"
    Maintenance.createBranch(spark, "lakehouse", Seq("br_ns"), "exp", "idle")
    // advance main well past the fork, then expire hard
    (0 until 3).foreach { i =>
      Seq((500 + i, s"m$i")).toDF("k", "v").createOrReplaceTempView(s"br_exp_$i")
      spark.sql(s"INSERT INTO $t SELECT * FROM br_exp_$i")
    }
    Maintenance.expireSnapshots(spark, "lakehouse", Seq("br_ns"), "exp", retainVersions = 1)
    // the commitless branch still resolves to its fork snapshot
    spark.sql(s"SELECT * FROM $t VERSION AS OF 'idle'").count() shouldBe 2
    spark.sql(s"DROP TABLE $t")
  }

  test("main's .changes never leaks branch commits; publish surfaces them as inserts") {
    // The WAP contract extended to CDC consumers: a changelog reader on
    // main must not observe audit-stage writes (they are unpublished by
    // definition), and after fast_forward the published rows arrive as
    // ordinary insert changes at the published versions — so a
    // downstream .changes pipeline sees exactly the publish, never the
    // staging.
    mkTable("wapcdc")
    val t = "lakehouse.br_ns.wapcdc"
    spark.sql("CALL lakehouse.system.branch('br_ns', 'wapcdc', 'stage')").collect()
    Seq((20, "p"), (21, "q")).toDF("k", "v").createOrReplaceTempView("br_cdc_w")
    spark.sql(
      "CALL lakehouse.system.append_to_branch('br_ns', 'wapcdc', 'stage', 'br_cdc_w')")
      .collect()

    spark.sql(s"SELECT k FROM $t.changes").collect()
      .map(_.getInt(0)).sorted shouldBe Array(1, 2)

    spark.sql("CALL lakehouse.system.fast_forward('br_ns', 'wapcdc', 'stage')").collect()
    val after = spark.sql(s"SELECT k, _change_type, _commit_version FROM $t.changes")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2)))
    after.map(_._1).sorted shouldBe Array(1, 2, 20, 21)
    val published = after.filter(r => r._1 >= 20)
    published.foreach(_._2 shouldBe "insert")
    // published changes carry the PUBLISHED version, after the fork
    val forkV = after.filter(_._1 <= 2).map(_._3).max
    published.foreach(_._3 should be > forkV)
    spark.sql(s"DROP TABLE $t")
  }

  test("branch and tag names share one ref namespace; numeric names refused") {
    mkTable("refguard")
    Maintenance.tag(spark, "lakehouse", Seq("br_ns"), "refguard", "pin", 1)
    val e = intercept[IllegalArgumentException] {
      Maintenance.createBranch(spark, "lakehouse", Seq("br_ns"), "refguard", "pin")
    }
    e.getMessage should include("already exists")
    Maintenance.createBranch(spark, "lakehouse", Seq("br_ns"), "refguard", "dev")
    val e2 = intercept[IllegalArgumentException] {
      Maintenance.createBranch(spark, "lakehouse", Seq("br_ns"), "refguard", "dev")
    }
    e2.getMessage should include("already exists")
    // all-digit refs would be shadowed by numeric VERSION AS OF resolution
    intercept[IllegalArgumentException] {
      Maintenance.createBranch(spark, "lakehouse", Seq("br_ns"), "refguard", "123")
    }.getMessage should include("non-digit")
    intercept[IllegalArgumentException] {
      Maintenance.tag(spark, "lakehouse", Seq("br_ns"), "refguard", "42", 1)
    }.getMessage should include("non-digit")
    spark.sql("DROP TABLE lakehouse.br_ns.refguard")
  }

  test("two concurrent branch appends both land (branch commit rebase)") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    mkTable("race")
    Maintenance.createBranch(spark, "lakehouse", Seq("br_ns"), "race", "ingest")
    // fleet-scale WAP: N ingest jobs land on one audit branch; every
    // appender must succeed via rebase, none may clobber another
    val writers = (0 until 4).map { i =>
      Future {
        val rows = Seq((100 + i, s"w$i")).toDF("k", "v")
        Maintenance.appendToBranch(spark, "lakehouse", Seq("br_ns"), "race", "ingest", rows)
      }
    }
    Await.result(Future.sequence(writers), 120.seconds).foreach(_ shouldBe 1L)
    val branchRows = spark.sql(
      "SELECT k FROM lakehouse.br_ns.race VERSION AS OF 'ingest'")
      .collect().map(_.getInt(0)).sorted
    branchRows shouldBe Array(1, 2, 100, 101, 102, 103)
    // main still at the pre-branch snapshot; publish surfaces all four
    spark.table("lakehouse.br_ns.race").count() shouldBe 2
    Maintenance.fastForward(spark, "lakehouse", Seq("br_ns"), "race", "ingest")
    spark.table("lakehouse.br_ns.race").count() shouldBe 6
    spark.sql("DROP TABLE lakehouse.br_ns.race")
  }

  test("graft.wap.branch routes plain SQL INSERT to the audit branch") {
    mkTable("wapconf")
    val t = "lakehouse.br_ns.wapconf"
    spark.sql("CALL lakehouse.system.branch('br_ns', 'wapconf', 'audit')")
    try {
      spark.conf.set("graft.wap.branch", "audit")
      // the UNCHANGED ingest SQL lands on the branch
      Seq((10, "x"), (11, "y")).toDF("k", "v").createOrReplaceTempView("wapconf_w")
      spark.sql(s"INSERT INTO $t SELECT * FROM wapconf_w")
      // main readers see nothing; the audit read sees the staged rows
      spark.table(t).count() shouldBe 2
      spark.sql(s"SELECT * FROM $t VERSION AS OF 'audit'").count() shouldBe 4

      // row-level DML and overwrites are refused while routing (a
      // main-head write in a session that believes it targets the
      // branch would be silently wrong)
      val e1 = intercept[Exception](
        spark.sql(s"UPDATE $t SET v = 'q' WHERE k = 1"))
      e1.getMessage should include("graft.wap.branch")
      val e2 = intercept[Exception](
        spark.sql(s"INSERT OVERWRITE $t SELECT * FROM wapconf_w"))
      e2.getMessage should include("graft.wap.branch")
      // a typo'd branch name is refused, not auto-created
      spark.conf.set("graft.wap.branch", "audti")
      val e3 = intercept[Exception](
        spark.sql(s"INSERT INTO $t SELECT * FROM wapconf_w"))
      e3.getMessage should include("no such")
    } finally spark.conf.unset("graft.wap.branch")

    // conf unset: publish and read back on main
    spark.sql("CALL lakehouse.system.fast_forward('br_ns', 'wapconf', 'audit')")
    spark.table(t).count() shouldBe 4
    spark.sql(s"DROP TABLE $t")
  }

  test("branch appends enforce CHECK, generated and identity declarations") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.br_ns")
    spark.sql("DROP TABLE IF EXISTS lakehouse.br_ns.bguard")
    spark.sql("CREATE TABLE lakehouse.br_ns.bguard (" +
      "id BIGINT GENERATED BY DEFAULT AS IDENTITY (START WITH 10 INCREMENT BY 1), " +
      "k INT, up STRING GENERATED ALWAYS AS (upper(cast(k AS STRING))), " +
      "CONSTRAINT k_pos CHECK (k > 0))")
    val t = "lakehouse.br_ns.bguard"
    spark.sql("CALL lakehouse.system.branch('br_ns', 'bguard', 'audit')")

    // a violating CHECK row is refused on the branch write, not at publish
    Seq((500L, -1, "stale")).toDF("id", "k", "up")
      .createOrReplaceTempView("bguard_bad")
    val e1 = intercept[Exception](spark.sql(
      "CALL lakehouse.system.append_to_branch('br_ns', 'bguard', 'audit', 'bguard_bad')"))
    e1.getMessage should include("k_pos")

    // a good row: generated column is COMPUTED (stale value overwritten),
    // the explicit BY DEFAULT id lands, and the branch mark advances past it
    Seq((500L, 7, "stale")).toDF("id", "k", "up")
      .createOrReplaceTempView("bguard_ok")
    spark.sql(
      "CALL lakehouse.system.append_to_branch('br_ns', 'bguard', 'audit', 'bguard_ok')")
    val staged = spark.sql(s"SELECT id, k, up FROM $t VERSION AS OF 'audit'")
      .as[(Long, Int, String)].collect().toSeq
    staged shouldBe Seq((500L, 7, "7"))

    // a NULL id cannot mint on a branch — refused loudly
    Seq((Option.empty[Long], 8, "X")).toDF("id", "k", "up")
      .createOrReplaceTempView("bguard_null")
    val e2 = intercept[Exception](spark.sql(
      "CALL lakehouse.system.append_to_branch('br_ns', 'bguard', 'audit', 'bguard_null')"))
    e2.getMessage should include("cannot mint")

    // publish: the next main INSERT mints PAST the staged explicit id
    spark.sql("CALL lakehouse.system.fast_forward('br_ns', 'bguard', 'audit')")
    spark.sql(s"INSERT INTO $t (k) VALUES (9)")
    val minted = spark.table(t).where($"k" === 9)
      .select($"id").as[Long].head()
    minted should be > 500L
    spark.sql(s"DROP TABLE $t")
  }

  test("a GENERATED ALWAYS identity table refuses branch appends up front") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.br_ns")
    spark.sql("DROP TABLE IF EXISTS lakehouse.br_ns.balways")
    spark.sql("CREATE TABLE lakehouse.br_ns.balways (" +
      "id BIGINT GENERATED ALWAYS AS IDENTITY, v STRING)")
    spark.sql("CALL lakehouse.system.branch('br_ns', 'balways', 'audit')")
    Seq((1L, "a")).toDF("id", "v").createOrReplaceTempView("balways_src")
    val e = intercept[Exception](spark.sql(
      "CALL lakehouse.system.append_to_branch('br_ns', 'balways', 'audit', 'balways_src')"))
    e.getMessage should include("GENERATED ALWAYS")
    spark.sql("DROP TABLE lakehouse.br_ns.balways")
  }

  private implicit class PairsToMap(rows: Array[(String, String, Int)]) {
    def toMap2: Map[(String, String), Int] =
      rows.map { case (n, ty, v) => (n, ty) -> v }.toMap
  }
}
