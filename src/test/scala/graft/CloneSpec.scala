package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.catalog.{Maintenance, MergeOnRead, TableMetadata}

/** Zero-copy shallow clone (`Maintenance.cloneTable`, `CALL
  * system.clone_table` — Delta SHALLOW CLONE / Iceberg `snapshot`):
  * the clone's first commit hard-links the source's current snapshot;
  * no data bytes move, pending delete entries apply identically, and
  * the two tables evolve independently afterwards.
  */
class CloneSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tableDir(ns: String, name: String): java.nio.file.Path =
    spark.sessionState.catalogManager.catalog("lakehouse")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(Array(ns), name))
      .asInstanceOf[graft.catalog.LakehouseTable].tableDir

  private def mkSource(tbl: String, short: String): Unit = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.cl_ns")
    spark.sql(s"CREATE TABLE $tbl (k INT, v STRING)")
    (0 until 2).foreach { c =>
      (0 until 50).map(i => (c * 50 + i, s"v$c-$i")).toDF("k", "v")
        .createOrReplaceTempView(s"cl_src_$short")
      spark.sql(s"INSERT INTO $tbl SELECT * FROM cl_src_$short")
    }
  }

  test("clone links the current snapshot: rows, pending deletes, stats, zero copy") {
    val t = "lakehouse.cl_ns.s1"
    mkSource(t, "s1")
    // a pending equality delete entry must fold identically in the clone
    MergeOnRead.morDelete(spark, "lakehouse", Seq("cl_ns"), "s1", Seq(10, 60).toDF("k"))

    val linked = spark.sql(
      "CALL lakehouse.system.clone_table(ns => 'cl_ns', tbl => 's1', " +
        "dst_ns => 'cl_ns', dst_tbl => 'd1')").collect().head.getLong(0)
    linked should be >= 1L

    val c = "lakehouse.cl_ns.d1"
    spark.table(c).count() shouldBe 98
    spark.table(c).where($"k" === 10).count() shouldBe 0
    spark.table(c).where($"k" === 11).count() shouldBe 1

    val srcMeta = TableMetadata.load(tableDir("cl_ns", "s1"))
    val dstMeta = TableMetadata.load(tableDir("cl_ns", "d1"))
    dstMeta.files shouldBe srcMeta.files
    dstMeta.fileStats shouldBe srcMeta.fileStats
    dstMeta.deleteFiles shouldBe srcMeta.deleteFiles
    dstMeta.snapshots.last.operation shouldBe "clone"
    dstMeta.properties("graft.clone.source") shouldBe s"cl_ns.s1@v${srcMeta.version}"
    // hard link, not copy: same inode
    Files.isSameFile(
      tableDir("cl_ns", "s1").resolve(srcMeta.files.head),
      tableDir("cl_ns", "d1").resolve(dstMeta.files.head)) shouldBe true
    spark.sql(s"DROP TABLE $c")
    spark.sql(s"DROP TABLE $t")
  }

  test("clone and source evolve independently; source vacuum cannot break the clone") {
    val t = "lakehouse.cl_ns.s2"
    mkSource(t, "s2")
    Maintenance.cloneTable(spark, "lakehouse", Seq("cl_ns"), "s2", Seq("cl_ns"), "d2")
    val c = "lakehouse.cl_ns.d2"

    // writes to the clone do not touch the source
    Seq((999, "clone-only")).toDF("k", "v").createOrReplaceTempView("cl_w")
    spark.sql(s"INSERT INTO $c SELECT * FROM cl_w")
    spark.table(c).count() shouldBe 101
    spark.table(t).count() shouldBe 100

    // rewrite + vacuum the SOURCE aggressively: its old files (the ones
    // the clone links) disappear from the source dir, but the clone's
    // own links keep the data alive
    spark.sql(s"DELETE FROM $t WHERE k < 25")
    Maintenance.compact(spark, "lakehouse", Seq("cl_ns"), "s2")
    Maintenance.vacuum(spark, "lakehouse", Seq("cl_ns"), "s2",
      retainVersions = 1, retentionMs = 0L)
    spark.table(t).count() shouldBe 75
    spark.table(c).count() shouldBe 101
    spark.table(c).where($"k" === 0).count() shouldBe 1
    spark.sql(s"DROP TABLE $c")
    spark.sql(s"DROP TABLE $t")
  }

  test("tags and branches do not carry into the clone (their versions don't exist there)") {
    val t = "lakehouse.cl_ns.s5"
    mkSource(t, "s5")
    val srcVersion = graft.catalog.TableMetadata.load(tableDir("cl_ns", "s5")).version
    spark.sql(s"CALL lakehouse.system.tag('cl_ns', 's5', 'rel_a', $srcVersion)")
    Maintenance.cloneTable(spark, "lakehouse", Seq("cl_ns"), "s5", Seq("cl_ns"), "d5")
    val dstMeta = TableMetadata.load(tableDir("cl_ns", "d5"))
    dstMeta.properties.keys.exists(_.startsWith(Maintenance.TagPrefix)) shouldBe false
    dstMeta.properties.keys.exists(_.startsWith(Maintenance.BranchPrefix)) shouldBe false
    // the source keeps its tag
    spark.sql(s"SELECT COUNT(*) FROM $t VERSION AS OF 'rel_a'")
      .collect().head.getLong(0) shouldBe 100
    spark.sql("DROP TABLE lakehouse.cl_ns.d5")
    spark.sql(s"DROP TABLE $t")
  }

  test("cloning onto an existing table is refused") {
    val t = "lakehouse.cl_ns.s3"
    mkSource(t, "s3")
    intercept[org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException] {
      Maintenance.cloneTable(spark, "lakehouse", Seq("cl_ns"), "s3", Seq("cl_ns"), "s3")
    }
    spark.sql(s"DROP TABLE $t")
  }

  test("a bucketed source clones with its bucket layout intact") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.cl_ns")
    val t = "lakehouse.cl_ns.s4"
    spark.sql(
      s"CREATE TABLE $t (k INT, v STRING) TBLPROPERTIES (" +
        "'graft.bucket.column'='k', 'graft.bucket.count'='4')")
    (0 until 40).map(i => (i, s"b$i")).toDF("k", "v").createOrReplaceTempView("cl_s4")
    spark.sql(s"INSERT INTO $t SELECT * FROM cl_s4")
    Maintenance.cloneTable(spark, "lakehouse", Seq("cl_ns"), "s4", Seq("cl_ns"), "d4")
    val dstMeta = TableMetadata.load(tableDir("cl_ns", "d4"))
    dstMeta.properties("graft.bucket.column") shouldBe "k"
    // bucket-to-file mapping is derived from the preserved rel paths
    dstMeta.files.foreach { f =>
      graft.catalog.Bucketing.bucketIdOf(f) should not be None
    }
    spark.table("lakehouse.cl_ns.d4").count() shouldBe 40
    spark.sql(s"DROP TABLE lakehouse.cl_ns.d4")
    spark.sql(s"DROP TABLE $t")
  }

  test("a deletion-vector-backed source clones readable: the blob links with the entry") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.cl_ns")
    spark.sql("DROP TABLE IF EXISTS lakehouse.cl_ns.dvsrc")
    spark.sql("CREATE TABLE lakehouse.cl_ns.dvsrc (k INT, v STRING) " +
      "TBLPROPERTIES ('graft.merge.mode'='merge-on-read')")
    (0 until 50).map(i => (i, s"v$i")).toDF("k", "v").createOrReplaceTempView("cl_dv_src")
    spark.sql("INSERT INTO lakehouse.cl_ns.dvsrc SELECT * FROM cl_dv_src")
    Seq((1, "x")).toDF("k", "v").createOrReplaceTempView("cl_dv_c1")
    spark.sql("""MERGE INTO lakehouse.cl_ns.dvsrc t USING cl_dv_c1 s ON t.k = s.k
                |WHEN MATCHED THEN UPDATE SET t.v = s.v""".stripMargin)
    Seq((2, "y")).toDF("k", "v").createOrReplaceTempView("cl_dv_c2")
    spark.sql("""MERGE INTO lakehouse.cl_ns.dvsrc t USING cl_dv_c2 s ON t.k = s.k
                |WHEN MATCHED THEN UPDATE SET t.v = s.v""".stripMargin)
    spark.sql("CALL lakehouse.system.consolidate_deletes('cl_ns', 'dvsrc')")
    val srcMeta = graft.catalog.TableMetadata.load(tableDir("cl_ns", "dvsrc"))
    srcMeta.deleteFiles.filter(_.isPositional).head.vector should not be ""

    spark.sql(
      "CALL lakehouse.system.clone_table('cl_ns', 'dvsrc', 'cl_ns', 'dvclone')")
    // the clone reads through ITS OWN linked vector blob — before the
    // fix the blob wasn't linked and this read crashed NoSuchFile
    java.nio.file.Files.exists(tableDir("cl_ns", "dvclone")
      .resolve(srcMeta.deleteFiles.filter(_.isPositional).head.vector)) shouldBe true
    graft.catalog.DeletionVectors.clearCacheForTesting()
    spark.table("lakehouse.cl_ns.dvclone").where($"k" === 1 || $"k" === 2)
      .orderBy($"k").as[(Int, String)].collect().toSeq shouldBe
      Seq((1, "x"), (2, "y"))
    spark.table("lakehouse.cl_ns.dvclone").count() shouldBe 50
    spark.sql("DROP TABLE lakehouse.cl_ns.dvclone")
    spark.sql("DROP TABLE lakehouse.cl_ns.dvsrc")
  }
}
