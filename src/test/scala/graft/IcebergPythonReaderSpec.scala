package graft

import java.nio.file.{Files, Paths}

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
