package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.catalog.PiiAudit

/** Column-level PII audit: PII-shaped string columns get flagged with
  * their detected kind and the table carries the reference's
  * `has_pii` governance property, derived from data instead of set by
  * hand. */
class PiiAuditSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def props(name: String): Map[String, String] =
    spark.sessionState.catalogManager.catalog("lakehouse")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("pii_ns"), name))
      .asInstanceOf[graft.catalog.LakehouseTable].meta.properties

  test("audit flags email/phone/ssn columns, leaves plain text alone, sets has_pii") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.pii_ns")
    spark.sql("CREATE TABLE lakehouse.pii_ns.users " +
      "(id BIGINT, email STRING, phone STRING, ssn STRING, note STRING)")
    (0 until 200).map { i =>
      (i.toLong, s"user$i@example.com", f"555-01${i % 100}%02d",
        f"${i % 900 + 100}%03d-${i % 90 + 10}%02d-${i % 9000 + 1000}%04d",
        s"plain note number $i with words")
    }.toDF("id", "email", "phone", "ssn", "note").createOrReplaceTempView("pii_src")
    spark.sql("INSERT INTO lakehouse.pii_ns.users SELECT * FROM pii_src")

    val flagged = PiiAudit.audit(spark, "lakehouse", Seq("pii_ns"), "users")
    flagged.keySet shouldBe Set("email", "phone", "ssn")
    flagged("email") should contain("email")
    flagged("phone") should contain("phone")
    flagged("ssn") should contain("ssn")

    val p = props("users")
    p(PiiAudit.HasPiiProp) shouldBe "true"
    p(PiiAudit.ColumnsProp) should include("email:email")
    p(PiiAudit.ColumnsProp) should include("ssn:ssn")
    p(PiiAudit.ColumnsProp) should not include "note"

    // the audit is a commit: visible in history, re-runnable
    spark.sql("SELECT operation FROM lakehouse.pii_ns.users.history ORDER BY version")
      .collect().last.getString(0) shouldBe "pii-audit"
    spark.sql("DROP TABLE lakehouse.pii_ns.users")
  }

  test("clean table audits to has_pii=false and clears stale flags") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.pii_ns")
    spark.sql("CREATE TABLE lakehouse.pii_ns.clean (id BIGINT, note STRING)")
    (0 until 50).map(i => (i.toLong, s"only words here $i"))
      .toDF("id", "note").createOrReplaceTempView("pii_clean_src")
    spark.sql("INSERT INTO lakehouse.pii_ns.clean SELECT * FROM pii_clean_src")
    // simulate a stale flag from an earlier schema
    spark.sql("ALTER TABLE lakehouse.pii_ns.clean SET TBLPROPERTIES " +
      s"('${PiiAudit.ColumnsProp}'='note:email')")

    PiiAudit.audit(spark, "lakehouse", Seq("pii_ns"), "clean") shouldBe empty
    val p = props("clean")
    p(PiiAudit.HasPiiProp) shouldBe "false"
    p.get(PiiAudit.ColumnsProp) shouldBe None
    spark.sql("DROP TABLE lakehouse.pii_ns.clean")
  }

  test("PII living only in the last-committed file is still flagged (no head-sample bias)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.pii_ns")
    spark.sql("CREATE TABLE lakehouse.pii_ns.tail_t (id BIGINT, contact STRING)")
    // early commits: far more rows than the sample budget, contact empty
    (0 until 3).foreach { c =>
      (0 until 2000).map(i => ((c * 2000 + i).toLong, ""))
        .toDF("id", "contact").createOrReplaceTempView(s"pii_tail_$c")
      spark.sql(s"INSERT INTO lakehouse.pii_ns.tail_t SELECT * FROM pii_tail_$c")
    }
    // the LAST commit is where the PII lives — a head sample of the
    // first files would certify the table clean
    (0 until 200).map(i => ((6000 + i).toLong, s"late$i@leak.io"))
      .toDF("id", "contact").createOrReplaceTempView("pii_tail_last")
    spark.sql("INSERT INTO lakehouse.pii_ns.tail_t SELECT * FROM pii_tail_last")

    // sampleN far below the table size forces real sampling
    val flagged = PiiAudit.audit(spark, "lakehouse", Seq("pii_ns"), "tail_t", sampleN = 500)
    flagged.keySet shouldBe Set("contact")
    flagged("contact") should contain("email")
    props("tail_t")(PiiAudit.HasPiiProp) shouldBe "true"
    spark.sql("DROP TABLE lakehouse.pii_ns.tail_t")
  }

  test("redactedView pseudonymizes flagged columns, preserves join keys, refuses unaudited") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.pii_ns")
    spark.sql("CREATE TABLE lakehouse.pii_ns.rv (id BIGINT, email STRING, note STRING)")
    (0 until 100).map(i => (i.toLong, s"u$i@mail.net", s"note $i"))
      .toDF("id", "email", "note").createOrReplaceTempView("pii_rv_src")
    spark.sql("INSERT INTO lakehouse.pii_ns.rv SELECT * FROM pii_rv_src")

    // unaudited table must refuse — silence would leak raw values
    val e = intercept[IllegalArgumentException] {
      PiiAudit.redactedView(spark, "lakehouse", Seq("pii_ns"), "rv", "rv_safe")
    }
    e.getMessage should include("audit")

    PiiAudit.audit(spark, "lakehouse", Seq("pii_ns"), "rv")
    PiiAudit.redactedView(spark, "lakehouse", Seq("pii_ns"), "rv", "rv_safe") shouldBe Seq("email")

    val rows = spark.table("lakehouse.pii_ns.rv_safe").orderBy($"id").collect()
    rows should have length 100
    // raw emails never appear; hashes are stable md5
    rows.map(_.getString(1)) should not contain "u0@mail.net"
    rows.head.getString(1) shouldBe org.apache.commons.codec.digest.DigestUtils.md5Hex("u0@mail.net")
    rows.head.getString(2) shouldBe "note 0" // unflagged passes through

    // equality survives pseudonymization: self-join on the hashed key
    val v = spark.table("lakehouse.pii_ns.rv_safe")
    v.as("a").join(v.as("b"), $"a.email" === $"b.email").count() shouldBe 100

    // the view tracks the CURRENT snapshot
    Seq((100L, "new@mail.net", "late")).toDF("id", "email", "note")
      .createOrReplaceTempView("pii_rv_late")
    spark.sql("INSERT INTO lakehouse.pii_ns.rv SELECT * FROM pii_rv_late")
    spark.table("lakehouse.pii_ns.rv_safe").count() shouldBe 101

    spark.sql("DROP VIEW lakehouse.pii_ns.rv_safe")
    spark.sql("DROP TABLE lakehouse.pii_ns.rv")
  }

  test("CALL system.pii_audit returns the flagged column count") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.pii_ns")
    spark.sql("CREATE TABLE lakehouse.pii_ns.proc_t (id BIGINT, mail STRING)")
    (0 until 50).map(i => (i.toLong, s"p$i@host.org"))
      .toDF("id", "mail").createOrReplaceTempView("pii_proc_src")
    spark.sql("INSERT INTO lakehouse.pii_ns.proc_t SELECT * FROM pii_proc_src")
    spark.sql("CALL lakehouse.system.pii_audit('pii_ns', 'proc_t')")
      .collect()(0).getLong(0) shouldBe 1L
    props("proc_t")(PiiAudit.HasPiiProp) shouldBe "true"
    spark.sql("DROP TABLE lakehouse.pii_ns.proc_t")
  }
}
