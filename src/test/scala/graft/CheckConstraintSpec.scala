package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Write-time CHECK constraints (`'graft.check.<name>' = '<bool expr>'`,
  * the Delta ADD CONSTRAINT surface as table properties): a row
  * violates iff the expression is FALSE (NULL passes — SQL UNKNOWN);
  * every write path that produces new rows enforces row-locally, and
  * declaring a constraint over existing data verifies it first.
  */
class CheckConstraintSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rootCause(t: Throwable): Throwable = {
    var c = t
    while (c.getCause != null && c.getCause != c) c = c.getCause
    c
  }

  test("INSERT refuses violating rows with the constraint name; valid rows pass") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.chk")
    spark.sql(
      "CREATE TABLE lakehouse.chk.t1 (k INT, v STRING) TBLPROPERTIES (" +
        "'graft.check.k_pos' = 'k > 0')")
    Seq((1, "a"), (2, "b")).toDF("k", "v").createOrReplaceTempView("chk_ok")
    spark.sql("INSERT INTO lakehouse.chk.t1 SELECT * FROM chk_ok")
    spark.table("lakehouse.chk.t1").count() shouldBe 2

    Seq((3, "c"), (-1, "bad")).toDF("k", "v").createOrReplaceTempView("chk_bad")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO lakehouse.chk.t1 SELECT * FROM chk_bad")
    }
    rootCause(e).getMessage should include("k_pos")
    // the failed write landed nothing
    spark.table("lakehouse.chk.t1").count() shouldBe 2
    spark.sql("DROP TABLE lakehouse.chk.t1")
  }

  test("NULL check results pass (SQL UNKNOWN rule)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.chk")
    spark.sql(
      "CREATE TABLE lakehouse.chk.t2 (k INT, v STRING) TBLPROPERTIES (" +
        "'graft.check.k_pos' = 'k > 0')")
    Seq((Some(1), "a"), (None, "nullk")).toDF("k", "v").createOrReplaceTempView("chk_null")
    spark.sql("INSERT INTO lakehouse.chk.t2 SELECT * FROM chk_null")
    spark.table("lakehouse.chk.t2").count() shouldBe 2
    spark.sql("DROP TABLE lakehouse.chk.t2")
  }

  test("adding a constraint verifies existing rows; violating table refuses the DDL") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.chk")
    spark.sql("CREATE TABLE lakehouse.chk.t3 (k INT, v STRING)")
    Seq((1, "a"), (-5, "neg")).toDF("k", "v").createOrReplaceTempView("chk_pre")
    spark.sql("INSERT INTO lakehouse.chk.t3 SELECT * FROM chk_pre")
    val e = intercept[Exception] {
      spark.sql(
        "ALTER TABLE lakehouse.chk.t3 SET TBLPROPERTIES ('graft.check.k_pos' = 'k > 0')")
    }
    rootCause(e).getMessage should include("1 existing")
    // constraint NOT committed
    spark.sql("SHOW TBLPROPERTIES lakehouse.chk.t3").collect()
      .map(_.getString(0)) should not contain "graft.check.k_pos"

    // a satisfiable constraint lands and guards future writes
    spark.sql(
      "ALTER TABLE lakehouse.chk.t3 SET TBLPROPERTIES ('graft.check.k_big' = 'k > -10')")
    Seq((-50, "way")).toDF("k", "v").createOrReplaceTempView("chk_post")
    intercept[Exception] {
      spark.sql("INSERT INTO lakehouse.chk.t3 SELECT * FROM chk_post")
    }
    spark.sql("DROP TABLE lakehouse.chk.t3")
  }

  test("declaration-time validation: unknown column, non-boolean, nondeterministic") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.chk")
    def bad(props: String): Throwable = {
      val name = s"b${props.hashCode.abs % 1000}"
      intercept[Exception] {
        spark.sql(s"CREATE TABLE lakehouse.chk.$name (k INT) TBLPROPERTIES ($props)")
      }
    }
    rootCause(bad("'graft.check.c1' = 'nope > 0'")).getMessage should
      include("does not resolve")
    rootCause(bad("'graft.check.c2' = 'k + 1'")).getMessage should
      include("must be BOOLEAN")
    rootCause(bad("'graft.check.c3' = 'rand() > 0.5'")).getMessage should
      include("deterministic")
  }

  test("dropping a column referenced by a constraint is refused") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.chk")
    spark.sql(
      "CREATE TABLE lakehouse.chk.t4 (k INT, v STRING) TBLPROPERTIES (" +
        "'graft.check.k_pos' = 'k > 0')")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE lakehouse.chk.t4 DROP COLUMN k")
    }
    rootCause(e).getMessage.toLowerCase should include("does not resolve")
    spark.sql("DROP TABLE lakehouse.chk.t4")
  }

  test("merge-on-read MERGE enforces constraints on inserted and updated versions") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.chk")
    spark.sql(
      "CREATE TABLE lakehouse.chk.t5 (id INT, amt DOUBLE) TBLPROPERTIES (" +
        "'graft.check.amt_pos' = 'amt >= 0', 'write.merge.mode' = 'merge-on-read')")
    Seq((1, 10.0), (2, 20.0)).toDF("id", "amt").createOrReplaceTempView("chk_m_base")
    spark.sql("INSERT INTO lakehouse.chk.t5 SELECT * FROM chk_m_base")

    // violating UPDATE version via MERGE
    Seq((2, -5.0)).toDF("id", "amt").createOrReplaceTempView("chk_m_upd")
    val e1 = intercept[Exception] {
      spark.sql(
        """MERGE INTO lakehouse.chk.t5 t USING chk_m_upd s ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET t.amt = s.amt""".stripMargin)
    }
    rootCause(e1).getMessage should include("amt_pos")
    spark.table("lakehouse.chk.t5").where($"id" === 2)
      .select($"amt").collect().head.getDouble(0) shouldBe 20.0

    // violating INSERT via MERGE
    Seq((9, -1.0)).toDF("id", "amt").createOrReplaceTempView("chk_m_ins")
    val e2 = intercept[Exception] {
      spark.sql(
        """MERGE INTO lakehouse.chk.t5 t USING chk_m_ins s ON t.id = s.id
          |WHEN NOT MATCHED THEN INSERT (id, amt) VALUES (s.id, s.amt)""".stripMargin)
    }
    rootCause(e2).getMessage should include("amt_pos")
    spark.table("lakehouse.chk.t5").count() shouldBe 2

    // a clean MERGE still works
    Seq((3, 30.0)).toDF("id", "amt").createOrReplaceTempView("chk_m_ok")
    spark.sql(
      """MERGE INTO lakehouse.chk.t5 t USING chk_m_ok s ON t.id = s.id
        |WHEN NOT MATCHED THEN INSERT (id, amt) VALUES (s.id, s.amt)""".stripMargin)
    spark.table("lakehouse.chk.t5").count() shouldBe 3
    spark.sql("DROP TABLE lakehouse.chk.t5")
  }

  test("copy-on-write UPDATE/MERGE cannot commit a violating row") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.chk")
    // NO merge-on-read mode: the group-based COW rewrite path
    spark.sql(
      "CREATE TABLE lakehouse.chk.t9 (k INT, v STRING) TBLPROPERTIES (" +
        "'graft.check.k_pos' = 'k > 0')")
    Seq((1, "a"), (2, "b")).toDF("k", "v").createOrReplaceTempView("chk_cow")
    spark.sql("INSERT INTO lakehouse.chk.t9 SELECT * FROM chk_cow")

    val e = intercept[Exception] {
      spark.sql("UPDATE lakehouse.chk.t9 SET k = -5 WHERE v = 'a'")
    }
    rootCause(e).getMessage should include("k_pos")
    // nothing changed, nothing lost
    spark.table("lakehouse.chk.t9").orderBy($"k").as[(Int, String)].collect().toSeq shouldBe
      Seq((1, "a"), (2, "b"))
    // a clean COW update still works
    spark.sql("UPDATE lakehouse.chk.t9 SET k = 10 WHERE v = 'a'")
    spark.table("lakehouse.chk.t9").where($"k" === 10).count() shouldBe 1
    spark.sql("DROP TABLE lakehouse.chk.t9")
  }

  test("CTAS cannot smuggle a violating row past a same-DDL constraint") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.chk")
    Seq((1, "ok"), (-3, "bad")).toDF("k", "v").createOrReplaceTempView("chk_ctas_src")
    val e = intercept[Exception] {
      spark.sql(
        "CREATE TABLE lakehouse.chk.t10 TBLPROPERTIES ('graft.check.k_pos' = 'k > 0') " +
          "AS SELECT * FROM chk_ctas_src")
    }
    rootCause(e).getMessage should include("k_pos")
    // the staged table never published
    spark.catalog.tableExists("lakehouse.chk.t10") shouldBe false
    // a clean CTAS with the constraint works
    spark.sql(
      "CREATE TABLE lakehouse.chk.t11 TBLPROPERTIES ('graft.check.k_pos' = 'k > 0') " +
        "AS SELECT * FROM chk_ctas_src WHERE k > 0")
    spark.table("lakehouse.chk.t11").count() shouldBe 1
    spark.sql("DROP TABLE lakehouse.chk.t11")
  }

  test("constraint names resolve case-insensitively on ADD/DROP") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.chk")
    spark.sql("CREATE TABLE lakehouse.chk.t12 (k INT)")
    spark.sql("ALTER TABLE lakehouse.chk.t12 ADD CONSTRAINT K_Pos CHECK (k > 0)")
    // a same-name-different-case duplicate is refused, not silently added
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE lakehouse.chk.t12 ADD CONSTRAINT k_pos CHECK (k > 1)")
    }
    rootCause(e).getMessage should include("already exists")
    // DROP finds it regardless of case
    spark.sql("ALTER TABLE lakehouse.chk.t12 DROP CONSTRAINT k_POS")
    Seq(-9).toDF("k").createOrReplaceTempView("chk_ci")
    spark.sql("INSERT INTO lakehouse.chk.t12 SELECT * FROM chk_ci")
    spark.table("lakehouse.chk.t12").count() shouldBe 1
    spark.sql("DROP TABLE lakehouse.chk.t12")
  }

  test("native SQL surface: ADD CONSTRAINT ... CHECK / DROP CONSTRAINT") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.chk")
    spark.sql("CREATE TABLE lakehouse.chk.t7 (k INT, v STRING)")
    Seq((1, "a")).toDF("k", "v").createOrReplaceTempView("chk_n_base")
    spark.sql("INSERT INTO lakehouse.chk.t7 SELECT * FROM chk_n_base")

    spark.sql("ALTER TABLE lakehouse.chk.t7 ADD CONSTRAINT k_pos CHECK (k > 0)")
    // the constraint enforces like a property-declared one
    Seq((-2, "bad")).toDF("k", "v").createOrReplaceTempView("chk_n_bad")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO lakehouse.chk.t7 SELECT * FROM chk_n_bad")
    }
    rootCause(e).getMessage should include("k_pos")

    // ADD CONSTRAINT verifies existing rows like the property path
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE lakehouse.chk.t7 ADD CONSTRAINT k_big CHECK (k > 100)")
    }
    rootCause(e2).getMessage should include("existing")

    // DROP CONSTRAINT lifts enforcement
    spark.sql("ALTER TABLE lakehouse.chk.t7 DROP CONSTRAINT k_pos")
    spark.sql("INSERT INTO lakehouse.chk.t7 SELECT * FROM chk_n_bad")
    spark.table("lakehouse.chk.t7").count() shouldBe 2
    // dropping a missing constraint without IF EXISTS fails
    intercept[Exception] {
      spark.sql("ALTER TABLE lakehouse.chk.t7 DROP CONSTRAINT nope")
    }
    spark.sql("DROP TABLE lakehouse.chk.t7")
  }

  test("inline CREATE TABLE constraint survives and enforces from the first insert") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.chk")
    spark.sql(
      "CREATE TABLE lakehouse.chk.t8 (k INT, v STRING, CONSTRAINT k_pos CHECK (k > 0))")
    Seq((-1, "bad")).toDF("k", "v").createOrReplaceTempView("chk_i_bad")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO lakehouse.chk.t8 SELECT * FROM chk_i_bad")
    }
    rootCause(e).getMessage should include("k_pos")
    spark.sql("DROP TABLE lakehouse.chk.t8")
  }

  test("a constraint added MID-STREAM enforces from the next epoch (per-epoch compile)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.chk")
    spark.sql("CREATE TABLE lakehouse.chk.t13 (k INT, v STRING)")
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Int, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("chk-mid-ckpt-").toString
    val q = in.toDF().toDF("k", "v").writeStream
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .toTable("lakehouse.chk.t13")
    try {
      in.addData((1, "pre"))
      q.processAllAvailable()
      // constraint lands while the stream is live — the writer factory
      // reloads metadata per epoch, so the NEXT epoch must enforce it
      spark.sql("ALTER TABLE lakehouse.chk.t13 ADD CONSTRAINT k_pos CHECK (k > 0)")
      in.addData((-3, "post"))
      val e = intercept[Exception] { q.processAllAvailable() }
      rootCause(e).getMessage should include("k_pos")
      spark.table("lakehouse.chk.t13").count() shouldBe 1
    } finally q.stop()
    spark.sql("DROP TABLE lakehouse.chk.t13")
  }

  test("ADD CONSTRAINT racing violating INSERTs: never both committed") {
    // The invariant the no-rebase commit protects: a constraint that
    // LANDS was verified against the snapshot it committed on — so the
    // final table can hold the constraint, or violating rows, NEVER
    // both. (A property-change rebase over the racing append would
    // allow both: the verification ran pre-race.)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.chk")
    for (round <- 0 until 3) {
      val t = s"lakehouse.chk.race$round"
      spark.sql(s"CREATE TABLE $t (k INT)")
      Seq(1, 2).toDF("k").createOrReplaceTempView(s"chk_race_ok$round")
      spark.sql(s"INSERT INTO $t SELECT * FROM chk_race_ok$round")
      Seq(-7).toDF("k").createOrReplaceTempView(s"chk_race_bad$round")

      val fIns = Future {
        try { spark.sql(s"INSERT INTO $t SELECT * FROM chk_race_bad$round"); true }
        catch { case _: Throwable => false }
      }
      val fDdl = Future {
        try { spark.sql(s"ALTER TABLE $t ADD CONSTRAINT k_pos CHECK (k > 0)"); true }
        catch { case _: Throwable => false }
      }
      val insLanded = Await.result(fIns, 120.seconds)
      val ddlLanded = Await.result(fDdl, 120.seconds)

      val violating = spark.table(t).where($"k" <= 0).count()
      val constrained = spark.sql(s"SHOW TBLPROPERTIES $t").collect()
        .exists(_.getString(0) == "graft.check.k_pos")
      withClue(s"round $round: ins=$insLanded ddl=$ddlLanded " +
        s"violating=$violating constrained=$constrained: ") {
        (constrained && violating > 0) shouldBe false
      }
      spark.sql(s"DROP TABLE $t")
    }
  }

  test("informational PK/UNIQUE/FK round-trip: stored NOT ENFORCED, reported back") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.chk")
    spark.sql("DROP TABLE IF EXISTS lakehouse.chk.kc1")
    spark.sql("DROP TABLE IF EXISTS lakehouse.chk.kc2")
    spark.sql("CREATE TABLE lakehouse.chk.kc1 (id BIGINT, ref BIGINT, v STRING, " +
      "CONSTRAINT kc1_pk PRIMARY KEY (id) NOT ENFORCED RELY)")
    spark.sql("CREATE TABLE lakehouse.chk.kc2 (id BIGINT)")
    spark.sql("ALTER TABLE lakehouse.chk.kc1 ADD CONSTRAINT kc1_uq " +
      "UNIQUE (v) NOT ENFORCED")
    spark.sql("ALTER TABLE lakehouse.chk.kc1 ADD CONSTRAINT kc1_fk FOREIGN KEY (ref) " +
      "REFERENCES lakehouse.chk.kc2 (id) NOT ENFORCED RELY")

    def table() = spark.sessionState.catalogManager.catalog("lakehouse")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("chk"), "kc1"))
    val cs = table().constraints().map(c => c.name -> c).toMap
    cs.keySet shouldBe Set("kc1_pk", "kc1_uq", "kc1_fk")
    all(cs.values.map(_.enforced())) shouldBe false
    cs("kc1_pk").rely() shouldBe true
    cs("kc1_uq").rely() shouldBe false
    cs("kc1_pk") shouldBe a[org.apache.spark.sql.connector.catalog.constraints.PrimaryKey]
    cs("kc1_uq") shouldBe a[org.apache.spark.sql.connector.catalog.constraints.Unique]
    val fk = cs("kc1_fk")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.constraints.ForeignKey]
    fk.referencedTable().name() shouldBe "kc2"
    fk.columns().map(_.fieldNames.mkString(".")).toSeq shouldBe Seq("ref")

    // inserts are NOT validated against informational constraints
    // (duplicate PK values commit — the writer guarantees uniqueness)
    Seq((1L, 1L, "a"), (1L, 1L, "b")).toDF("id", "ref", "v")
      .createOrReplaceTempView("kc1_src")
    spark.sql("INSERT INTO lakehouse.chk.kc1 SELECT * FROM kc1_src")
    spark.table("lakehouse.chk.kc1").count() shouldBe 2

    // DROP CONSTRAINT removes a key constraint by name
    spark.sql("ALTER TABLE lakehouse.chk.kc1 DROP CONSTRAINT kc1_uq")
    table().constraints().map(_.name).toSet shouldBe Set("kc1_pk", "kc1_fk")
    // duplicate names are refused across kinds
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE lakehouse.chk.kc1 ADD CONSTRAINT kc1_pk " +
        "UNIQUE (v) NOT ENFORCED")
    }
    e.getMessage should include("already exists")
    // a DROP COLUMN referenced by a key constraint is refused
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE lakehouse.chk.kc1 DROP COLUMN ref")
    }
    e2.getMessage should include("kc1_fk")
    spark.sql("DROP TABLE lakehouse.chk.kc1")
    spark.sql("DROP TABLE lakehouse.chk.kc2")
  }

  test("constraints are visible through the DSv2 Table.constraints surface") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.chk")
    spark.sql(
      "CREATE TABLE lakehouse.chk.t14 (k INT, CONSTRAINT k_pos CHECK (k > 0))")
    val table = spark.sessionState.catalogManager.catalog("lakehouse")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("chk"), "t14"))
    val cs = table.constraints()
    cs.length shouldBe 1
    cs.head.name shouldBe "k_pos"
    cs.head.enforced shouldBe true
    cs.head.toDDL should include("k > 0")
    spark.sql("DROP TABLE lakehouse.chk.t14")
  }

  test("streaming epochs enforce constraints row-locally") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.chk")
    spark.sql(
      "CREATE TABLE lakehouse.chk.t6 (k INT, v STRING) TBLPROPERTIES (" +
        "'graft.check.k_pos' = 'k > 0')")
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Int, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("chk-ckpt-").toString
    val q = in.toDF().toDF("k", "v").writeStream
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .toTable("lakehouse.chk.t6")
    try {
      in.addData((1, "ok"))
      q.processAllAvailable()
      spark.table("lakehouse.chk.t6").count() shouldBe 1

      in.addData((-7, "bad"))
      val e = intercept[Exception] { q.processAllAvailable() }
      rootCause(e).getMessage should include("k_pos")
      // the violating epoch published nothing
      spark.table("lakehouse.chk.t6").count() shouldBe 1
    } finally q.stop()
    spark.sql("DROP TABLE lakehouse.chk.t6")
  }

  test("a CHECK cannot shadow a key constraint of the same name") {
    // DROP CONSTRAINT resolves CHECK first: a silent same-name shadow
    // would make the later drop remove the wrong constraint
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.chk")
    spark.sql("DROP TABLE IF EXISTS lakehouse.chk.kc9")
    spark.sql("CREATE TABLE lakehouse.chk.kc9 (id BIGINT NOT NULL, v INT)")
    spark.sql("ALTER TABLE lakehouse.chk.kc9 ADD CONSTRAINT c9 PRIMARY KEY (id) NOT ENFORCED")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE lakehouse.chk.kc9 ADD CONSTRAINT c9 CHECK (v > 0)")
    }
    e.getMessage.toLowerCase should include("already exists")
    // case-insensitive, like every SQL identifier
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE lakehouse.chk.kc9 ADD CONSTRAINT C9 CHECK (v > 0)")
    }
    e2.getMessage.toLowerCase should include("already exists")
    spark.sql("DROP TABLE lakehouse.chk.kc9")
  }
}
