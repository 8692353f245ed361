package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.catalog.{BloomIndex, Maintenance}

/** Per-file bloom sidecars: point-lookup file skipping on columns the
  * layout does NOT cluster — where min/max ranges overlap on every
  * file and prune nothing. */
class BloomIndexSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fileCounts(): (Int, Int) =
    graft.catalog.LakehouseTable.lastScanFileCounts.get()

  test("bloom probes skip files min/max ranges cannot, and never change results") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.bloom_ns")
    spark.sql("CREATE TABLE lakehouse.bloom_ns.t (k INT, v STRING)")
    // 4 commits → 4 files; every file's v-range is [k00_cI, k99_cI]-ish
    // and OVERLAPS the others (shared k-prefix), so range pruning keeps
    // all of them for any point lookup
    (0 until 4).foreach { c =>
      (0 until 100).map(j => (j, f"k$j%02d_c$c")).toDF("k", "v").coalesce(1)
        .createOrReplaceTempView("bloom_src")
      spark.sql("INSERT INTO lakehouse.bloom_ns.t SELECT * FROM bloom_src")
    }

    // before the index: the lookup scans every file
    spark.table("lakehouse.bloom_ns.t").where($"v" === "k50_c2").count() shouldBe 1
    fileCounts() shouldBe ((4, 4))

    BloomIndex.build(spark, "lakehouse", Seq("bloom_ns"), "t", Seq("v"),
      expectedPerFile = 10000L) should be > 0

    // present key: only the owning file survives
    val hit = spark.table("lakehouse.bloom_ns.t").where($"v" === "k50_c2")
    hit.collect().map(r => (r.getInt(0), r.getString(1))) shouldBe Array((50, "k50_c2"))
    fileCounts() shouldBe ((1, 4))

    // absent key: metadata alone proves emptiness — zero files opened
    spark.table("lakehouse.bloom_ns.t").where($"v" === "k50_c9").count() shouldBe 0
    fileCounts() shouldBe ((0, 4))

    // IN probes: files holding ANY member survive
    spark.table("lakehouse.bloom_ns.t")
      .where($"v".isin("k10_c0", "k10_c3")).count() shouldBe 2
    fileCounts() shouldBe ((2, 4))

    // non-equality predicates ignore the index (conservative)
    spark.table("lakehouse.bloom_ns.t").where($"v" >= "k99").count() shouldBe 4
    fileCounts() shouldBe ((4, 4))
    spark.sql("DROP TABLE lakehouse.bloom_ns.t")
  }

  test("appends to an indexed table get sidecars at write time") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.bloom_ns")
    spark.sql("CREATE TABLE lakehouse.bloom_ns.late (k INT, v STRING)")
    Seq((1, "a"), (2, "b")).toDF("k", "v").coalesce(1)
      .createOrReplaceTempView("late_src")
    spark.sql("INSERT INTO lakehouse.bloom_ns.late SELECT * FROM late_src")
    BloomIndex.build(spark, "lakehouse", Seq("bloom_ns"), "late", Seq("v"), 1000L)
    // a post-index append: the INSERT path writes the new file's
    // sidecar itself, so the index does not decay under appends
    Seq((3, "c"), (4, "e")).toDF("k", "v").coalesce(1)
      .createOrReplaceTempView("late_src2")
    spark.sql("INSERT INTO lakehouse.bloom_ns.late SELECT * FROM late_src2")
    spark.table("lakehouse.bloom_ns.late").where($"v" === "c").count() shouldBe 1
    fileCounts() shouldBe ((1, 2)) // old file bloom-skipped
    // "d" sits inside the NEW file's [c,e] min/max range, so only its
    // write-time bloom can prove it absent
    spark.table("lakehouse.bloom_ns.late").where($"v" === "d").count() shouldBe 0
    fileCounts() shouldBe ((0, 2))
    spark.sql("DROP TABLE lakehouse.bloom_ns.late")
  }

  test("widening ALTER COLUMN disables stale bloom probes instead of mispruning") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.bloom_ns")
    spark.sql("CREATE TABLE lakehouse.bloom_ns.alt (k INT, v STRING)")
    (0 until 2).foreach { c =>
      (0 until 50).map(j => (c * 1000 + j, s"r$j")).toDF("k", "v").coalesce(1)
        .createOrReplaceTempView("alt_src")
      spark.sql("INSERT INTO lakehouse.bloom_ns.alt SELECT * FROM alt_src")
    }
    BloomIndex.build(spark, "lakehouse", Seq("bloom_ns"), "alt", Seq("k"), 1000L)
    spark.table("lakehouse.bloom_ns.alt").where($"k" === 1010).count() shouldBe 1
    fileCounts()._1 shouldBe 1 // bloom (with min/max) prunes to the owning file

    // widening rewrites nothing: the sidecars were hashed over INT
    // values, probes would now hash LONGs — the index must deactivate,
    // not prove present keys absent
    spark.sql("ALTER TABLE lakehouse.bloom_ns.alt ALTER COLUMN k TYPE BIGINT")
    spark.table("lakehouse.bloom_ns.alt").where($"k" === 1010L).count() shouldBe 1
    // re-index under the new type restores pruning
    BloomIndex.build(spark, "lakehouse", Seq("bloom_ns"), "alt", Seq("k"), 1000L)
    spark.table("lakehouse.bloom_ns.alt").where($"k" === 1010L).count() shouldBe 1
    fileCounts()._1 shouldBe 1
    spark.sql("DROP TABLE lakehouse.bloom_ns.alt")
  }

  test("re-indexing one column keeps another column's registration") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.bloom_ns")
    spark.sql("CREATE TABLE lakehouse.bloom_ns.two (a STRING, b STRING)")
    (0 until 2).foreach { c =>
      (0 until 40).map(j => (f"a$j%02d_c$c", f"b$j%02d_c$c")).toDF("a", "b").coalesce(1)
        .createOrReplaceTempView("two_src")
      spark.sql("INSERT INTO lakehouse.bloom_ns.two SELECT * FROM two_src")
    }
    BloomIndex.build(spark, "lakehouse", Seq("bloom_ns"), "two", Seq("a"), 1000L)
    BloomIndex.build(spark, "lakehouse", Seq("bloom_ns"), "two", Seq("b"), 1000L)
    // column a's probes still work after b's build
    spark.table("lakehouse.bloom_ns.two").where($"a" === "a10_c1").count() shouldBe 1
    fileCounts()._1 shouldBe 1
    spark.sql("DROP TABLE lakehouse.bloom_ns.two")
  }

  test("CALL bloom_index builds the index; vacuum collects orphaned sidecars") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.bloom_ns")
    spark.sql("CREATE TABLE lakehouse.bloom_ns.vc (k INT, v STRING)")
    (0 until 3).foreach { c =>
      (0 until 50).map(j => (j, f"x$j%02d_c$c")).toDF("k", "v").coalesce(1)
        .createOrReplaceTempView("vc_src")
      spark.sql("INSERT INTO lakehouse.bloom_ns.vc SELECT * FROM vc_src")
    }
    spark.sql("CALL lakehouse.system.bloom_index('bloom_ns', 'vc', 'v')")
      .collect()(0).getLong(0) shouldBe 3L
    spark.table("lakehouse.bloom_ns.vc").where($"v" === "x10_c1").count() shouldBe 1
    fileCounts() shouldBe ((1, 3))

    val lt = spark.sessionState.catalogManager.catalog("lakehouse")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("bloom_ns"), "vc"))
      .asInstanceOf[graft.catalog.LakehouseTable]
    val bdir = BloomIndex.bloomsDir(lt.tableDir)
    java.nio.file.Files.list(bdir).count() shouldBe 3L

    // compaction re-indexes its output file at write time; vacuum then
    // drops the old files AND their now-orphaned sidecars, leaving
    // exactly the compacted file's sidecar
    Maintenance.compact(spark, "lakehouse", Seq("bloom_ns"), "vc", targetFiles = 1)
    Maintenance.vacuum(spark, "lakehouse", Seq("bloom_ns"), "vc",
      retainVersions = 1, retentionMs = 0L)
    java.nio.file.Files.list(bdir).count() shouldBe 1L
    spark.table("lakehouse.bloom_ns.vc").where($"v" === "x10_c1").count() shouldBe 1
    spark.sql("DROP TABLE lakehouse.bloom_ns.vc")
  }
}
