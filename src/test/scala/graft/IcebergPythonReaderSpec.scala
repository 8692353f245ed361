package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._
import scala.sys.process.{Process, ProcessLogger}

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The export's self-confirmation breaker: `tools/check_iceberg.py` is
  * an INDEPENDENT-LANGUAGE Iceberg v2 reader (pure-python Avro
  * container decoder + DuckDB over the parquet, zero graft code, zero
  * Iceberg libraries) that re-reads the exported snapshot from the
  * artifacts alone and diffs the row multiset against what graft's own
  * scan produced. IcebergExportSpec's re-enactment and IcebergImport
  * are both graft Scala — a shared misreading of the Iceberg spec
  * would pass its own round-trip; a second implementation in a second
  * language cannot share that bug. Cancels (never silently passes)
  * when python3/duckdb are absent. */
class IcebergPythonReaderSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tool: String =
    Paths.get("tools", "check_iceberg.py").toAbsolutePath.toString

  test("python reader matches graft's scan on a MoR-dirty write-through-mirrored table") {
    val probe = Process(Seq("python3", "-c", "import duckdb"))
      .!(ProcessLogger(_ => (), _ => ()))
    assume(probe == 0, "python3 + duckdb not available in this environment")
    assume(Files.isRegularFile(Paths.get(tool)), s"missing $tool")

    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.ice_ns")
    spark.sql("DROP TABLE IF EXISTS lakehouse.ice_ns.pyr")
    // write-through mirror on from birth: no CALL export anywhere below
    spark.sql("CREATE TABLE lakehouse.ice_ns.pyr (k INT, v STRING, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES (" +
      "'graft.delete.mode'='merge-on-read', 'graft.merge.mode'='merge-on-read', " +
      "'graft.iceberg.mirror'='true')")
    Seq("a", "b").foreach { pv =>
      (0 until 40).map(i => (i, s"$pv-$i", pv)).toDF("k", "v", "p")
        .createOrReplaceTempView("ice_pyr_src")
      spark.sql("INSERT INTO lakehouse.ice_ns.pyr SELECT * FROM ice_pyr_src")
    }
    // both v2 delete shapes live at read time
    spark.sql("DELETE FROM lakehouse.ice_ns.pyr WHERE k >= 35 AND p = 'a'")
    Seq((1, "upd-1", "b"), (90, "new-90", "a"))
      .toDF("k", "v", "p").createOrReplaceTempView("ice_pyr_chg")
    spark.sql("""MERGE INTO lakehouse.ice_ns.pyr t USING ice_pyr_chg s
                |ON t.k = s.k AND t.p = s.p
                |WHEN MATCHED THEN UPDATE SET t.v = s.v
                |WHEN NOT MATCHED THEN INSERT (k, v, p) VALUES (s.k, s.v, s.p)
                |""".stripMargin)
    spark.sql("SELECT kind FROM lakehouse.ice_ns.pyr.delete_files")
      .collect().map(_.getString(0)).toSet shouldBe Set("equality", "positional")

    // expected row set: graft's own merged scan, dumped to parquet
    val expDir = Files.createTempDirectory("graft-pyreader-").toString
    spark.table("lakehouse.ice_ns.pyr").select($"k", $"v", $"p")
      .coalesce(1).write.mode("overwrite").parquet(expDir)

    val tableDir = Paths.get(TestSpark.warehouse, "ice_ns", "pyr").toString
    val out = new StringBuilder
    val code = Process(Seq("python3", tool, tableDir, expDir))
      .!(ProcessLogger(l => out.append(l).append('\n'), l => out.append(l).append('\n')))
    withClue(out.toString) {
      code shouldBe 0
      out.toString should include("MATCH")
    }
    spark.sql("DROP TABLE lakehouse.ice_ns.pyr")
  }

  test("python reader PRUNES by exported transform specs, not just re-reads rows") {
    val probe = Process(Seq("python3", "-c", "import duckdb"))
      .!(ProcessLogger(_ => (), _ => ()))
    assume(probe == 0, "python3 + duckdb not available in this environment")

    // a transform-spec export bug that only MIS-PRUNES keeps full reads
    // correct — only an opened-file-count assertion under a filter can
    // catch it from the independent-language side
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.ice_ns")
    spark.sql("DROP TABLE IF EXISTS lakehouse.ice_ns.pyd")
    spark.sql("CREATE TABLE lakehouse.ice_ns.pyd (k INT, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts)) TBLPROPERTIES ('graft.iceberg.mirror'='true')")
    spark.sql("INSERT INTO lakehouse.ice_ns.pyd VALUES " +
      "(1, TIMESTAMP'2024-03-01 08:00:00'), (2, TIMESTAMP'2024-03-01 19:30:00'), " +
      "(3, TIMESTAMP'2024-03-02 00:15:00'), (4, TIMESTAMP'2024-03-02 23:59:59'), " +
      "(5, TIMESTAMP'2024-03-03 12:00:00')")
    val expDir = Files.createTempDirectory("graft-pyprune-").toString
    spark.table("lakehouse.ice_ns.pyd")
      .filter($"ts" === "2024-03-02 00:15:00")
      .coalesce(1).write.mode("overwrite").parquet(expDir)
    val tableDir = Paths.get(TestSpark.warehouse, "ice_ns", "pyd").toString
    val out = new StringBuilder
    val code = Process(Seq("python3", tool, tableDir, expDir,
      "--filter", "ts=2024-03-02 00:15:00"))
      .!(ProcessLogger(l => out.append(l).append('\n'), l => out.append(l).append('\n')))
    withClue(out.toString) {
      code shouldBe 0
      out.toString should include("MATCH (1 rows")
      // three days laid out disjointly: the day filter must open ONLY
      // 2024-03-02's files — strictly fewer than the table's
      val Opened = "OPENED (\\d+) OF (\\d+) DATA FILES.*".r
      val line = out.toString.linesIterator.collectFirst {
        case l @ Opened(_, _) => l
      }.getOrElse(fail(s"no OPENED line in:\n$out"))
      val Opened(op, tot) = line: @unchecked
      op.toInt should be < tot.toInt
      op.toInt should be >= 1
    }
    // a DAY WINDOW (range conjuncts) prunes through the monotonic day
    // transform: tuple >= day(lo) AND tuple <= day(hi)
    val expWin = Files.createTempDirectory("graft-pywin-").toString
    spark.table("lakehouse.ice_ns.pyd")
      .filter($"ts" >= "2024-03-02 00:00:00" && $"ts" < "2024-03-03 00:00:00")
      .coalesce(1).write.mode("overwrite").parquet(expWin)
    val outW = new StringBuilder
    val codeW = Process(Seq("python3", tool, tableDir, expWin,
      "--filter", "ts>=2024-03-02 00:00:00,ts<2024-03-03 00:00:00"))
      .!(ProcessLogger(l => outW.append(l).append('\n'), l => outW.append(l).append('\n')))
    withClue(outW.toString) {
      codeW shouldBe 0
      outW.toString should include("MATCH (2 rows")
      val Opened = ".*OPENED (\\d+) OF (\\d+) DATA FILES.*".r
      val Some((op2, tot2)) = outW.toString.linesIterator.collectFirst {
        case Opened(a, b) => (a.toInt, b.toInt)
      }: @unchecked
      op2 should be < tot2
      op2 should be >= 1
    }
    spark.sql("DROP TABLE lakehouse.ice_ns.pyd")

    // bucket pruning: the python side recomputes Iceberg's bucket hash
    // from the published algorithm — if the Scala export hashed rows
    // into the wrong buckets, the pruned read would MISS k=7's row
    spark.sql("DROP TABLE IF EXISTS lakehouse.ice_ns.pyb")
    spark.sql(
      """CREATE TABLE lakehouse.ice_ns.pyb (k INT, v BIGINT)
        |PARTITIONED BY (bucket(4, k))
        |TBLPROPERTIES ('graft.bucket.hash'='iceberg',
        |               'graft.iceberg.mirror'='true')""".stripMargin)
    Seq.tabulate(200)(i => (i, i.toLong)).toDF("k", "v")
      .createOrReplaceTempView("pyb_src")
    spark.sql("INSERT INTO lakehouse.ice_ns.pyb SELECT * FROM pyb_src")
    val expB = Files.createTempDirectory("graft-pybucket-").toString
    spark.table("lakehouse.ice_ns.pyb").filter($"k" === 7)
      .coalesce(1).write.mode("overwrite").parquet(expB)
    val bDir = Paths.get(TestSpark.warehouse, "ice_ns", "pyb").toString
    val outB = new StringBuilder
    val codeB = Process(Seq("python3", tool, bDir, expB, "--filter", "k=7"))
      .!(ProcessLogger(l => outB.append(l).append('\n'), l => outB.append(l).append('\n')))
    withClue(outB.toString) {
      codeB shouldBe 0
      outB.toString should include("MATCH (1 rows")
      outB.toString should include("OPENED 1 OF 4 DATA FILES")
    }

    // per-row bucket verification: the tool recomputes EVERY row's
    // bucket with its own murmur3 and asserts it against the file's
    // claimed tuple — the full-layout proof (the filter above proves
    // only the one looked-up key's bucket)
    val expAll = Files.createTempDirectory("graft-pyballs-").toString
    spark.table("lakehouse.ice_ns.pyb")
      .coalesce(1).write.mode("overwrite").parquet(expAll)
    val outV = new StringBuilder
    val codeV = Process(Seq("python3", tool, bDir, expAll, "--verify-buckets"))
      .!(ProcessLogger(l => outV.append(l).append('\n'), l => outV.append(l).append('\n')))
    withClue(outV.toString) {
      codeV shouldBe 0
      outV.toString should include("BUCKETS VERIFIED (200 rows")
      outV.toString should include("MATCH (200 rows")
    }
    spark.sql("DROP TABLE lakehouse.ice_ns.pyb")
  }

  test("imported bucket layout re-exports verifiably: python re-hashes every row of the round trip") {
    val probe = Process(Seq("python3", "-c", "import duckdb"))
      .!(ProcessLogger(_ => (), _ => ()))
    assume(probe == 0, "python3 + duckdb not available in this environment")
    assume(Files.isRegularFile(Paths.get(tool)), s"missing $tool")

    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.ice_ns")
    Seq("pyrt", "pyrt_imp").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS lakehouse.ice_ns.$t"))
    spark.sql(
      """CREATE TABLE lakehouse.ice_ns.pyrt (k INT, v BIGINT)
        |PARTITIONED BY (bucket(4, k))
        |TBLPROPERTIES ('graft.bucket.hash'='iceberg')""".stripMargin)
    Seq.tabulate(200)(i => (i, i.toLong)).toDF("k", "v")
      .createOrReplaceTempView("pyrt_src")
    spark.sql("INSERT INTO lakehouse.ice_ns.pyrt SELECT * FROM pyrt_src")
    spark.sql("CALL lakehouse.system.export_iceberg('ice_ns', 'pyrt')")
    val srcMd = Paths.get(TestSpark.warehouse, "ice_ns", "pyrt", "metadata")
    val hint = Files.readString(srcMd.resolve("version-hint.text")).trim.toInt
    spark.sql("CALL lakehouse.system.import_iceberg('ice_ns', 'pyrt_imp', " +
      s"'${srcMd.resolve(s"v$hint.metadata.json")}')")
    spark.sql("CALL lakehouse.system.export_iceberg('ice_ns', 'pyrt_imp')")

    val impDir = Paths.get(TestSpark.warehouse, "ice_ns", "pyrt_imp").toString
    val expAll = Files.createTempDirectory("graft-pyrt-").toString
    spark.table("lakehouse.ice_ns.pyrt_imp")
      .coalesce(1).write.mode("overwrite").parquet(expAll)
    // --verify-buckets re-hashes EVERY row of every bucket-claimed file
    // with python's own murmur3 — a wrong claimed id anywhere in the
    // import's relabeling would fail here, not silently mis-prune
    val outV = new StringBuilder
    val codeV = Process(Seq("python3", tool, impDir, expAll, "--verify-buckets"))
      .!(ProcessLogger(l => outV.append(l).append('\n'), l => outV.append(l).append('\n')))
    withClue(outV.toString) {
      codeV shouldBe 0
      outV.toString should include("BUCKETS VERIFIED (200 rows")
      outV.toString should include("MATCH (200 rows")
    }
    // and the point lookup prunes externally on the RE-export
    val expOne = Files.createTempDirectory("graft-pyrt1-").toString
    spark.table("lakehouse.ice_ns.pyrt_imp").filter($"k" === 7)
      .coalesce(1).write.mode("overwrite").parquet(expOne)
    val outB = new StringBuilder
    val codeB = Process(Seq("python3", tool, impDir, expOne, "--filter", "k=7"))
      .!(ProcessLogger(l => outB.append(l).append('\n'), l => outB.append(l).append('\n')))
    withClue(outB.toString) {
      codeB shouldBe 0
      outB.toString should include("MATCH (1 rows")
      outB.toString should include("OPENED 1 OF 4 DATA FILES")
    }
    Seq("pyrt", "pyrt_imp").foreach(t => spark.sql(s"DROP TABLE lakehouse.ice_ns.$t"))
  }

  test("python reader verifies exported column BOUNDS: the external file-skipping contract") {
    val probe = Process(Seq("python3", "-c", "import duckdb"))
      .!(ProcessLogger(_ => (), _ => ()))
    assume(probe == 0, "python3 + duckdb not available in this environment")
    assume(Files.isRegularFile(Paths.get(tool)), s"missing $tool")

    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.ice_ns")
    spark.sql("DROP TABLE IF EXISTS lakehouse.ice_ns.pybnd")
    // the bound-serialization trouble spots: negative ints (sign bytes),
    // strings (truncation rules), doubles, temporals (epoch domains),
    // a decimal (bounds legitimately absent — FooterStats doesn't range
    // decimals — the checker must pass on no-claim, not crash), nulls
    spark.sql(
      """CREATE TABLE lakehouse.ice_ns.pybnd (
        |  k INT, s STRING, d DOUBLE, dec DECIMAL(9,2), dt DATE, ts TIMESTAMP)""".stripMargin)
    spark.sql(
      """INSERT INTO lakehouse.ice_ns.pybnd VALUES
        |  (-2147483648, 'aardvark', -1.5e30, -12345.67, DATE'1969-07-20',
        |   TIMESTAMP'1969-12-31 23:59:58.5'),
        |  (-7, NULL, 0.0, 0.01, DATE'2024-03-01', TIMESTAMP'2024-03-01 12:00:00'),
        |  (2147483647, 'zzzz~~', 2.5e30, 99999.99, DATE'2262-01-01',
        |   TIMESTAMP'2100-01-01 00:00:00')""".stripMargin)
    spark.sql("CALL lakehouse.system.export_iceberg('ice_ns', 'pybnd')")
    val bndDir = Paths.get(TestSpark.warehouse, "ice_ns", "pybnd").toString
    val expDir = Files.createTempDirectory("graft-pybnd-").toString
    spark.table("lakehouse.ice_ns.pybnd")
      .coalesce(1).write.mode("overwrite").parquet(expDir)
    val out = new StringBuilder
    val code = Process(Seq("python3", tool, bndDir, expDir, "--verify-bounds"))
      .!(ProcessLogger(l => out.append(l).append('\n'), l => out.append(l).append('\n')))
    withClue(out.toString) {
      code shouldBe 0
      out.toString should include("BOUNDS VERIFIED")
      out.toString should include("MATCH (3 rows")
      // claims actually checked, not vacuously zero: k/s/d/dt/ts carry
      // lower+upper+nulls claims on at least one file
      val Verified = ".*BOUNDS VERIFIED \\((\\d+) claims.*".r
      val Some(n) = out.toString.linesIterator.collectFirst {
        case Verified(c) => c.toInt
      }: @unchecked
      n should be >= 15
    }

    // the breaker half: corrupt ONE claimed lower bound in the manifest
    // (flip the sign byte of k's 4-byte LE minimum) and the checker
    // must FAIL — proving it reads the real claims, not its own echo
    val md = Paths.get(bndDir, "metadata")
    val manifests = Files.list(md).iterator().asScala
      .filter { p =>
        val n = p.getFileName.toString
        n.startsWith("im-") && n.endsWith(".avro")
      }.toSeq
    manifests should not be empty
    val bytes = Files.readAllBytes(manifests.head)
    // -2147483648 little-endian = 00 00 00 80; corrupt to 00 00 00 7f
    // (= +2130706432, far above the actual minimum)
    val pat = Array[Byte](0x00, 0x00, 0x00, 0x80.toByte)
    val idx = bytes.indices.find(i => i + 4 <= bytes.length &&
      bytes(i) == pat(0) && bytes(i + 1) == pat(1) &&
      bytes(i + 2) == pat(2) && bytes(i + 3) == pat(3))
    idx.isDefined shouldBe true
    bytes(idx.get + 3) = 0x7f
    Files.write(manifests.head, bytes)
    val out2 = new StringBuilder
    val code2 = Process(Seq("python3", tool, bndDir, expDir, "--verify-bounds"))
      .!(ProcessLogger(l => out2.append(l).append('\n'), l => out2.append(l).append('\n')))
    withClue(out2.toString) { code2 should not be 0 }

    spark.sql("DROP TABLE lakehouse.ice_ns.pybnd")
  }

  test("exported PARTITION STATISTICS verify per partition; import reads them advisory; stale files GC") {
    val probe = Process(Seq("python3", "-c", "import duckdb"))
      .!(ProcessLogger(_ => (), _ => ()))
    assume(probe == 0, "python3 + duckdb not available in this environment")
    assume(Files.isRegularFile(Paths.get(tool)), s"missing $tool")

    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.ice_ns")
    spark.sql("DROP TABLE IF EXISTS lakehouse.ice_ns.ppst")
    spark.sql("DROP TABLE IF EXISTS lakehouse.ice_ns.ppst_imp")
    spark.sql("CREATE TABLE lakehouse.ice_ns.ppst (k INT, p STRING) " +
      "PARTITIONED BY (p)")
    // three partitions; 'a' gets TWO inserts so its claimed
    // data_file_count exceeds one — per-partition aggregation, not
    // per-file echo
    for ((pv, lo) <- Seq(("a", 0), ("a", 40), ("b", 100), ("c", 200))) {
      (lo until lo + 7).map(i => (i, pv)).toDF("k", "p")
        .createOrReplaceTempView("ppst_src")
      spark.sql("INSERT INTO lakehouse.ice_ns.ppst SELECT * FROM ppst_src")
    }
    spark.sql("CALL lakehouse.system.export_iceberg('ice_ns', 'ppst')")
    val dir = Paths.get(TestSpark.warehouse, "ice_ns", "ppst")
    val md = dir.resolve("metadata")
    def pstatsFiles() = graft.catalog.Fs.children(md).filter { p =>
      val n = p.getFileName.toString
      n.startsWith("pstats-") && n.endsWith(".avro")
    }
    pstatsFiles() should have size 1

    val expDir = Files.createTempDirectory("graft-ppst-").toString
    spark.table("lakehouse.ice_ns.ppst")
      .coalesce(1).write.mode("overwrite").parquet(expDir)
    def pyCheck(): (Int, String) = {
      val out = new StringBuilder
      val code = Process(Seq("python3", tool, dir.toString, expDir,
        "--verify-bounds"))
        .!(ProcessLogger(l => out.append(l).append('\n'),
          l => out.append(l).append('\n')))
      (code, out.toString)
    }
    val (code1, out1) = pyCheck()
    withClue(out1) {
      code1 shouldBe 0
      out1 should include("PARTITION STATS VERIFIED (3 partitions")
      out1 should include("MATCH (28 rows")
    }

    // incremental maintenance + GC: another insert re-exports through
    // the write-through mirror (the table wasn't created with the
    // mirror property, so CALL again), and exactly ONE pstats file
    // remains — the stale one is retired like every other artifact
    // (they used to leak one per export)
    (300 until 307).map(i => (i, "b")).toDF("k", "p")
      .createOrReplaceTempView("ppst_src")
    spark.sql("INSERT INTO lakehouse.ice_ns.ppst SELECT * FROM ppst_src")
    spark.sql("CALL lakehouse.system.export_iceberg('ice_ns', 'ppst')")
    pstatsFiles() should have size 1
    spark.table("lakehouse.ice_ns.ppst")
      .coalesce(1).write.mode("overwrite").parquet(expDir)
    val (code2, out2) = pyCheck()
    withClue(out2) {
      code2 shouldBe 0
      out2 should include("PARTITION STATS VERIFIED (3 partitions")
    }

    // import reads the partition statistics ADVISORY: totals
    // cross-checked against the imported manifests, then recorded
    val hint = Files.readString(md.resolve("version-hint.text")).trim.toInt
    spark.sql("CALL lakehouse.system.import_iceberg('ice_ns', 'ppst_imp', " +
      s"'${md.resolve(s"v$hint.metadata.json")}')")
    val impProps = graft.catalog.TableMetadata.load(
      Paths.get(TestSpark.warehouse, "ice_ns", "ppst_imp")).properties
    impProps.get("graft.import.partition-stats.partitions") shouldBe Some("3")
    impProps.get("graft.import.partition-stats.rows") shouldBe Some("35")

    // the breaker: bump ONE claimed record count in the pstats Avro —
    // the python checker must FAIL, proving it reads the real claims
    val pstats = pstatsFiles().head
    val (recs, meta) = graft.catalog.IcebergExport.readAvro(pstats)
    recs.head.put("data_record_count",
      Long.box(recs.head.get("data_record_count").asInstanceOf[Long] + 1))
    Files.delete(pstats)
    graft.catalog.IcebergExport.writeAvro(
      pstats, recs.head.getSchema,
      meta.toSeq.filterNot(_._1.startsWith("avro.")), recs)
    val (code3, out3) = pyCheck()
    withClue(out3) { code3 should not be 0 }

    spark.sql("DROP TABLE lakehouse.ice_ns.ppst_imp")
    spark.sql("DROP TABLE lakehouse.ice_ns.ppst")
  }

  test("external time travel: a tagged snapshot reads back via refs after later DML") {
    val probe = Process(Seq("python3", "-c", "import duckdb"))
      .!(ProcessLogger(_ => (), _ => ()))
    assume(probe == 0, "python3 + duckdb not available in this environment")

    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.ice_ns")
    spark.sql("DROP TABLE IF EXISTS lakehouse.ice_ns.ptt")
    spark.sql("CREATE TABLE lakehouse.ice_ns.ptt (k INT, v STRING) " +
      "TBLPROPERTIES ('graft.delete.mode'='merge-on-read', " +
      "'graft.iceberg.mirror'='true')")
    (0 until 20).map(i => (i, s"a-$i")).toDF("k", "v")
      .createOrReplaceTempView("ice_ptt_1")
    spark.sql("INSERT INTO lakehouse.ice_ns.ptt SELECT * FROM ice_ptt_1") // v2
    (20 until 40).map(i => (i, s"b-$i")).toDF("k", "v")
      .createOrReplaceTempView("ice_ptt_2")
    spark.sql("INSERT INTO lakehouse.ice_ns.ptt SELECT * FROM ice_ptt_2") // v3
    spark.sql("CALL lakehouse.system.tag('ice_ns', 'ptt', 'train', 3)") // v4
    // history advances past the tag — the tagged snapshot must remain
    // externally readable through the mirror's refs
    spark.sql("DELETE FROM lakehouse.ice_ns.ptt WHERE k < 5") // v5
    (40 until 50).map(i => (i, s"c-$i")).toDF("k", "v")
      .createOrReplaceTempView("ice_ptt_3")
    spark.sql("INSERT INTO lakehouse.ice_ns.ptt SELECT * FROM ice_ptt_3") // v6

    val expDir = Files.createTempDirectory("graft-pyreader-tt-").toString
    spark.sql("SELECT k, v FROM lakehouse.ice_ns.ptt VERSION AS OF 'train'")
      .coalesce(1).write.mode("overwrite").parquet(expDir)
    val tableDir = Paths.get(TestSpark.warehouse, "ice_ns", "ptt").toString
    val out = new StringBuilder
    val code = Process(Seq("python3", tool, tableDir, expDir, "train"))
      .!(ProcessLogger(l => out.append(l).append('\n'), l => out.append(l).append('\n')))
    withClue(out.toString) {
      code shouldBe 0
      out.toString should include("MATCH (40 rows")
    }
    // time-travel IMPORT: the tagged snapshot pins as its own table —
    // the reproducibility story end-to-end ("the snapshot the model
    // trained on", importable anywhere by ref name)
    spark.sql("DROP TABLE IF EXISTS lakehouse.ice_ns.ptt_train")
    val mdDir = Paths.get(tableDir, "metadata")
    val hint = Files.readString(mdDir.resolve("version-hint.text")).trim.toInt
    spark.sql("CALL lakehouse.system.import_iceberg('ice_ns', 'ptt_train', " +
      s"'${mdDir.resolve(s"v$hint.metadata.json")}', 'train')")
    spark.table("lakehouse.ice_ns.ptt_train").select($"k", $"v")
      .collect().map(_.toString).sorted shouldBe
      spark.sql("SELECT k, v FROM lakehouse.ice_ns.ptt VERSION AS OF 'train'")
        .collect().map(_.toString).sorted
    spark.sql("DROP TABLE lakehouse.ice_ns.ptt_train")

    // and the current snapshot still matches the current scan
    val curDir = Files.createTempDirectory("graft-pyreader-cur-").toString
    spark.table("lakehouse.ice_ns.ptt").select($"k", $"v")
      .coalesce(1).write.mode("overwrite").parquet(curDir)
    val out2 = new StringBuilder
    val code2 = Process(Seq("python3", tool, tableDir, curDir))
      .!(ProcessLogger(l => out2.append(l).append('\n'), l => out2.append(l).append('\n')))
    withClue(out2.toString) {
      code2 shouldBe 0
      out2.toString should include("MATCH")
    }
    spark.sql("DROP TABLE lakehouse.ice_ns.ptt")
  }
}
