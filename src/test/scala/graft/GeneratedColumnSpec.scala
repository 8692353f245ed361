package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Generated columns (`c TYPE GENERATED ALWAYS AS (expr)`): the engine
  * computes the value on batch writes (writer-supplied values are
  * overwritten — "always generated" by construction) and VALIDATES
  * conformance on row-level writers that receive materialized rows
  * (merge-on-read DML), so a committed file can never disagree with
  * the expression.
  */
class GeneratedColumnSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rootCause(t: Throwable): Throwable = {
    var c = t
    while (c.getCause != null && c.getCause != c) c = c.getCause
    c
  }

  test("batch INSERT computes the generated column; supplied values are overwritten") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.gc")
    spark.sql(
      "CREATE TABLE lakehouse.gc.g1 (k INT, twice INT GENERATED ALWAYS AS (k * 2))")
    spark.sql("INSERT INTO lakehouse.gc.g1 (k) VALUES (5)")
    spark.table("lakehouse.gc.g1").as[(Int, Int)].collect().toSeq shouldBe Seq((5, 10))

    // even a writer that smuggles a value in cannot override generation
    Seq((7, 999)).toDF("k", "twice").createOrReplaceTempView("gc_smuggle")
    spark.sql("INSERT INTO lakehouse.gc.g1 SELECT * FROM gc_smuggle")
    spark.table("lakehouse.gc.g1").orderBy($"k").as[(Int, Int)].collect().toSeq shouldBe
      Seq((5, 10), (7, 14))
    spark.sql("DROP TABLE lakehouse.gc.g1")
  }

  test("string expressions and CTAS-shaped inserts generate too") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.gc")
    spark.sql(
      "CREATE TABLE lakehouse.gc.g2 (name STRING, " +
        "upper_name STRING GENERATED ALWAYS AS (upper(name)))")
    Seq("ada", "grace").toDF("name").createOrReplaceTempView("gc_names")
    spark.sql("INSERT INTO lakehouse.gc.g2 (name) SELECT name FROM gc_names")
    spark.table("lakehouse.gc.g2").orderBy($"name").as[(String, String)].collect().toSeq shouldBe
      Seq(("ada", "ADA"), ("grace", "GRACE"))
    // the generated value participates in pushdown/filtering like any column
    spark.table("lakehouse.gc.g2").where($"upper_name" === "ADA").count() shouldBe 1
    spark.sql("DROP TABLE lakehouse.gc.g2")
  }

  test("merge-on-read DML computes generated columns: supplied values are overwritten") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.gc")
    spark.sql(
      "CREATE TABLE lakehouse.gc.g3 (k INT, twice INT GENERATED ALWAYS AS (k * 2)) " +
        "TBLPROPERTIES ('write.merge.mode' = 'merge-on-read')")
    spark.sql("INSERT INTO lakehouse.gc.g3 (k) VALUES (1)")

    // an insert-ONLY MERGE plans as an append and the batch path simply
    // recomputes — the smuggled 11 becomes 18
    Seq((9, 11)).toDF("k", "t").createOrReplaceTempView("gc_ins")
    spark.sql(
      """MERGE INTO lakehouse.gc.g3 t USING gc_ins s ON t.k = s.k
        |WHEN NOT MATCHED THEN INSERT (k, twice) VALUES (s.k, s.t)""".stripMargin)
    spark.table("lakehouse.gc.g3").orderBy($"k").as[(Int, Int)].collect().toSeq shouldBe
      Seq((1, 2), (9, 18))

    // a MATCHED+NOT MATCHED MERGE takes the delta writer, which
    // COMPUTES too (Delta's semantics — generated on every write
    // path): placeholder/stale values in both the UPDATE and the
    // INSERT are overwritten with the expression's value, so MERGE
    // stays usable without the writer pre-computing anything
    Seq((1, 99), (5, 11)).toDF("k", "t").createOrReplaceTempView("gc_bad")
    spark.sql(
      """MERGE INTO lakehouse.gc.g3 t USING gc_bad s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET t.twice = s.t
        |WHEN NOT MATCHED THEN INSERT (k, twice) VALUES (s.k, s.t)""".stripMargin)
    spark.table("lakehouse.gc.g3").orderBy($"k").as[(Int, Int)].collect().toSeq shouldBe
      Seq((1, 2), (5, 10), (9, 18))
    spark.sql("DROP TABLE lakehouse.gc.g3")
  }

  test("copy-on-write UPDATE cannot leave a generated column stale") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.gc")
    // no merge-on-read mode: the COW rewrite path
    spark.sql(
      "CREATE TABLE lakehouse.gc.g7 (k INT, twice INT GENERATED ALWAYS AS (k * 2))")
    spark.sql("INSERT INTO lakehouse.gc.g7 (k) VALUES (3)")
    // updating the base column alone REFRESHES its dependents in the
    // rewrite (Delta's semantics): twice follows k without being SET
    spark.sql("UPDATE lakehouse.gc.g7 SET k = 9 WHERE k = 3")
    spark.table("lakehouse.gc.g7").as[(Int, Int)].collect().toSeq shouldBe Seq((9, 18))
    // an explicit non-conforming SET of the generated column itself is
    // overwritten with the computed value, never committed
    spark.sql("UPDATE lakehouse.gc.g7 SET twice = 777 WHERE k = 9")
    spark.table("lakehouse.gc.g7").as[(Int, Int)].collect().toSeq shouldBe Seq((9, 18))
    spark.sql("DROP TABLE lakehouse.gc.g7")
  }

  test("CTAS computes generated columns declared as properties") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.gc")
    Seq(1, 2).toDF("k").createOrReplaceTempView("gc_ctas_src")
    spark.sql(
      "CREATE TABLE lakehouse.gc.g8 TBLPROPERTIES ('graft.generated.neg' = '-k') " +
        "AS SELECT k, 0 AS neg FROM gc_ctas_src")
    spark.table("lakehouse.gc.g8").orderBy($"k").as[(Int, Int)].collect().toSeq shouldBe
      Seq((1, -1), (2, -2))
    spark.sql("DROP TABLE lakehouse.gc.g8")
  }

  test("CREATE OR REPLACE keeps inline generated columns and constraints (staged path)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.gc")
    spark.sql("CREATE TABLE lakehouse.gc.g9 (old STRING)")
    // the staged REPLACE used to forward only info.properties() and
    // silently drop both declarations
    spark.sql(
      "CREATE OR REPLACE TABLE lakehouse.gc.g9 " +
        "(k INT, twice INT GENERATED ALWAYS AS (k * 2), CONSTRAINT k_pos CHECK (k > 0))")
    spark.sql("INSERT INTO lakehouse.gc.g9 (k) VALUES (4)")
    spark.table("lakehouse.gc.g9").as[(Int, Int)].collect().toSeq shouldBe Seq((4, 8))
    Seq((-1, 0)).toDF("k", "twice").createOrReplaceTempView("gc_rep_bad")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO lakehouse.gc.g9 SELECT * FROM gc_rep_bad")
    }
    rootCause(e).getMessage should include("k_pos")
    spark.sql("DROP TABLE lakehouse.gc.g9")
  }

  test("declaring a generation expression over non-conforming existing rows is refused") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.gc")
    spark.sql("CREATE TABLE lakehouse.gc.g10 (k INT, b INT)")
    Seq((1, 999)).toDF("k", "b").createOrReplaceTempView("gc_nc")
    spark.sql("INSERT INTO lakehouse.gc.g10 SELECT * FROM gc_nc")
    val e = intercept[Exception] {
      spark.sql(
        "ALTER TABLE lakehouse.gc.g10 SET TBLPROPERTIES ('graft.generated.b' = 'k + 1')")
    }
    rootCause(e).getMessage should include("existing")
    spark.sql("DROP TABLE lakehouse.gc.g10")
  }

  test("DROP COLUMN of a generated column removes its expression too") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.gc")
    spark.sql(
      "CREATE TABLE lakehouse.gc.g11 (k INT, twice INT GENERATED ALWAYS AS (k * 2))")
    spark.sql("ALTER TABLE lakehouse.gc.g11 DROP COLUMN twice")
    spark.sql("SHOW TBLPROPERTIES lakehouse.gc.g11").collect()
      .map(_.getString(0)).exists(_.startsWith("graft.generated.")) shouldBe false
    spark.sql("INSERT INTO lakehouse.gc.g11 VALUES (7)")
    spark.table("lakehouse.gc.g11").count() shouldBe 1
    spark.sql("DROP TABLE lakehouse.gc.g11")
  }

  test("null input rows contribute nothing to the moments aggregator") {
    val agg = new graft.functions.CovAggregator(2)
    val buf = agg.reduce(agg.reduce(agg.zero, null), Array(1.0f, 2.0f))
    buf(0) shouldBe 1.0 // n counts only the real vector
    buf(1) shouldBe 1.0
    buf(2) shouldBe 2.0
  }

  test("declaration validation: bad references and identity columns refused") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.gc")
    // Spark's analyzer validates references itself once the capability
    // is declared; our own validator backstops property-level edits
    val e1 = intercept[Exception] {
      spark.sql(
        "CREATE TABLE lakehouse.gc.g4 (k INT, bad INT GENERATED ALWAYS AS (nope + 1))")
    }
    rootCause(e1).getMessage.toLowerCase should include("cannot be resolved")
    // an identity column on a non-integral type is refused at CREATE
    val e2 = intercept[Exception] {
      spark.sql(
        "CREATE TABLE lakehouse.gc.g5 (k STRING GENERATED ALWAYS AS IDENTITY, v STRING)")
    }
    rootCause(e2).getMessage.toLowerCase should include("identity")
    // property-level declaration of a broken expression is also refused
    val e3 = intercept[Exception] {
      spark.sql(
        "CREATE TABLE lakehouse.gc.g6 (k INT, b INT) TBLPROPERTIES (" +
          "'graft.generated.b' = 'nope + 1')")
    }
    rootCause(e3).getMessage.toLowerCase should include("does not resolve")
  }

  // ---- identity columns ----------------------------------------------------

  test("identity column mints unique increasing values from START/INCREMENT") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.gc")
    spark.sql("DROP TABLE IF EXISTS lakehouse.gc.id1")
    spark.sql("CREATE TABLE lakehouse.gc.id1 (" +
      "id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 100 INCREMENT BY 2), " +
      "v STRING)")
    Seq("a", "b", "c").toDF("v").createOrReplaceTempView("id1_src")
    // the writer supplies NULL for the engine-minted column
    spark.sql("INSERT INTO lakehouse.gc.id1 SELECT CAST(NULL AS BIGINT), v FROM id1_src")
    val ids = spark.table("lakehouse.gc.id1").select($"id")
      .as[Long].collect().sorted.toSeq
    ids.distinct.length shouldBe 3
    all(ids) should be >= 100L
    // step alignment: every minted value ≡ start (mod step)
    all(ids.map(i => (i - 100L) % 2L)) shouldBe 0L

    // a second insert continues PAST the first commit's range (the
    // high-water mark advanced in metadata)
    spark.sql("INSERT INTO lakehouse.gc.id1 SELECT CAST(NULL AS BIGINT), v FROM id1_src")
    val ids2 = spark.table("lakehouse.gc.id1").select($"id").as[Long].collect().toSeq
    ids2.distinct.length shouldBe 6
    ids2.sorted.drop(3).head should be > ids.max
    spark.sql("DROP TABLE lakehouse.gc.id1")
  }

  test("GENERATED ALWAYS refuses explicit values; BY DEFAULT accepts and advances past them") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.gc")
    spark.sql("DROP TABLE IF EXISTS lakehouse.gc.id2")
    spark.sql("DROP TABLE IF EXISTS lakehouse.gc.id3")
    spark.sql("CREATE TABLE lakehouse.gc.id2 (" +
      "id BIGINT GENERATED ALWAYS AS IDENTITY, v STRING)")
    Seq((42L, "x")).toDF("id", "v").createOrReplaceTempView("id2_src")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO lakehouse.gc.id2 SELECT id, v FROM id2_src")
    }
    rootCause(e).getMessage should include("GENERATED ALWAYS")

    spark.sql("CREATE TABLE lakehouse.gc.id3 (" +
      "id BIGINT GENERATED BY DEFAULT AS IDENTITY, v STRING)")
    spark.sql("INSERT INTO lakehouse.gc.id3 SELECT id, v FROM id2_src")
    spark.table("lakehouse.gc.id3").select($"id").as[Long].collect().toSeq shouldBe Seq(42L)
    // minted values after an explicit insert land PAST the explicit max
    Seq("y").toDF("v").createOrReplaceTempView("id3_src")
    spark.sql("INSERT INTO lakehouse.gc.id3 SELECT CAST(NULL AS BIGINT), v FROM id3_src")
    val minted = spark.table("lakehouse.gc.id3").where($"v" === "y")
      .select($"id").as[Long].collect()(0)
    minted should be > 42L
    spark.sql("DROP TABLE lakehouse.gc.id2")
    spark.sql("DROP TABLE lakehouse.gc.id3")
  }

  test("concurrent inserts mint disjoint identity ranges") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.gc")
    for (round <- 0 until 3) {
      val t = s"lakehouse.gc.idrace$round"
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"CREATE TABLE $t (id BIGINT GENERATED ALWAYS AS IDENTITY, v INT)")
      Seq.tabulate(50)(identity).toDF("v").createOrReplaceTempView(s"idrace_src$round")
      val inserts = (0 until 2).map { _ =>
        Future {
          spark.sql(s"INSERT INTO $t SELECT CAST(NULL AS BIGINT), v FROM idrace_src$round")
        }
      }
      inserts.foreach(Await.result(_, 120.seconds))
      val ids = spark.table(t).select($"id").as[Long].collect().toSeq
      withClue(s"round $round: ") {
        ids.length shouldBe 100
        ids.distinct.length shouldBe 100 // disjoint ranges, no collision
      }
      spark.sql(s"DROP TABLE $t")
    }
  }

  test("MoR UPDATE preserves identity values; MERGE INSERT without one fails loudly") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.gc")
    spark.sql("DROP TABLE IF EXISTS lakehouse.gc.id4")
    spark.sql("CREATE TABLE lakehouse.gc.id4 (" +
      "id BIGINT GENERATED ALWAYS AS IDENTITY, v STRING) " +
      "TBLPROPERTIES ('write.update.mode'='merge-on-read', " +
      "'write.merge.mode'='merge-on-read')")
    Seq("a", "b").toDF("v").createOrReplaceTempView("id4_src")
    spark.sql("INSERT INTO lakehouse.gc.id4 SELECT CAST(NULL AS BIGINT), v FROM id4_src")
    val before = spark.table("lakehouse.gc.id4").orderBy($"id")
      .as[(Long, String)].collect().toSeq

    spark.sql("UPDATE lakehouse.gc.id4 SET v = concat(v, '!')")
    val after = spark.table("lakehouse.gc.id4").orderBy($"id")
      .as[(Long, String)].collect().toSeq
    after.map(_._1) shouldBe before.map(_._1) // identity carried through
    after.map(_._2) shouldBe before.map(_._2).map(_ + "!")

    // an INSERT-ONLY merge is planned as an append through the batch
    // path — it MINTS like any insert
    Seq("zz").toDF("v").createOrReplaceTempView("id4_new")
    spark.sql("""MERGE INTO lakehouse.gc.id4 t USING id4_new s ON t.v = s.v
                |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (NULL, s.v)
                |""".stripMargin)
    val minted = spark.table("lakehouse.gc.id4").where($"v" === "zz")
      .select($"id").as[Long].collect()
    minted.length shouldBe 1
    minted(0) should be > before.map(_._1).max

    // a MIXED merge (matched + not matched) runs through the row-level
    // delta writer, which cannot mint: an inserted row without an
    // identity value must fail the identity row check, not commit NULL
    Seq("qq", "a!").toDF("v").createOrReplaceTempView("id4_mixed")
    val e = intercept[Exception] {
      spark.sql("""MERGE INTO lakehouse.gc.id4 t USING id4_mixed s ON t.v = s.v
                  |WHEN MATCHED THEN UPDATE SET v = concat(t.v, '?')
                  |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (NULL, s.v)
                  |""".stripMargin)
    }
    rootCause(e).getMessage should include("identity")
    spark.sql("DROP TABLE lakehouse.gc.id4")
  }

  test("INT identity columns are refused at declaration") {
    // the shuffle-free mint offsets partition blocks by 2^33 — any
    // multi-partition insert would overflow a 32-bit column (ANSI cast
    // failure at runtime); 64-bit headroom is checked at declaration
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.gc")
    spark.sql("DROP TABLE IF EXISTS lakehouse.gc.id7")
    val e = intercept[Exception] {
      spark.sql(
        "CREATE TABLE lakehouse.gc.id7 (id INT GENERATED ALWAYS AS IDENTITY, v STRING)")
    }
    rootCause(e).getMessage should include("BIGINT")
  }

  test("MoR MERGE with explicit BY DEFAULT ids advances the mark past them") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.gc")
    spark.sql("DROP TABLE IF EXISTS lakehouse.gc.id8")
    spark.sql("CREATE TABLE lakehouse.gc.id8 (" +
      "id BIGINT GENERATED BY DEFAULT AS IDENTITY, v STRING) " +
      "TBLPROPERTIES ('write.merge.mode'='merge-on-read', " +
      "'write.update.mode'='merge-on-read')")
    Seq("a").toDF("v").createOrReplaceTempView("id8_src")
    spark.sql("INSERT INTO lakehouse.gc.id8 SELECT CAST(NULL AS BIGINT), v FROM id8_src")
    // MIXED merge → the row-level delta writer; the inserted row
    // carries an explicit id far above the current mark
    Seq(("a", 0L), ("b", 500L)).toDF("v", "nid").createOrReplaceTempView("id8_m")
    spark.sql("""MERGE INTO lakehouse.gc.id8 t USING id8_m s ON t.v = s.v
                |WHEN MATCHED THEN UPDATE SET v = concat(t.v, '!')
                |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.nid, s.v)
                |""".stripMargin)
    spark.table("lakehouse.gc.id8").where($"v" === "b").select($"id")
      .as[Long].collect() shouldBe Array(500L)
    // the next batch mint must start past the explicit 500, never
    // re-minting it as a duplicate
    Seq("c").toDF("v").createOrReplaceTempView("id8_src2")
    spark.sql("INSERT INTO lakehouse.gc.id8 SELECT CAST(NULL AS BIGINT), v FROM id8_src2")
    val ids = spark.table("lakehouse.gc.id8").select($"id").as[Long].collect().toSeq
    ids.distinct.length shouldBe ids.length
    spark.table("lakehouse.gc.id8").where($"v" === "c").select($"id")
      .as[Long].collect()(0) should be > 500L
    spark.sql("DROP TABLE lakehouse.gc.id8")
  }

  test("MoR MERGE into a GENERATED ALWAYS identity table is refused up front") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.gc")
    spark.sql("DROP TABLE IF EXISTS lakehouse.gc.id9")
    spark.sql("CREATE TABLE lakehouse.gc.id9 (" +
      "id BIGINT GENERATED ALWAYS AS IDENTITY, v STRING) " +
      "TBLPROPERTIES ('write.merge.mode'='merge-on-read')")
    Seq("a").toDF("v").createOrReplaceTempView("id9_src")
    spark.sql("INSERT INTO lakehouse.gc.id9 SELECT CAST(NULL AS BIGINT), v FROM id9_src")
    Seq("a", "b").toDF("v").createOrReplaceTempView("id9_m")
    val e = intercept[Exception] {
      spark.sql("""MERGE INTO lakehouse.gc.id9 t USING id9_m s ON t.v = s.v
                  |WHEN MATCHED THEN UPDATE SET v = concat(t.v, '!')
                  |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (NULL, s.v)
                  |""".stripMargin)
    }
    rootCause(e).getMessage should include("GENERATED ALWAYS")
    spark.sql("DROP TABLE lakehouse.gc.id9")
  }

  test("an identity-range race can never shift values past an id-referencing CHECK") {
    // the loser of the race re-mints by shifting its written values —
    // the shift invalidates the pre-shift row-local CHECK run, so the
    // commit loop re-verifies; in EVERY interleaving exactly one insert
    // commits (ids within bound) and the other fails on the constraint
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.gc")
    for (round <- 0 until 3) {
      val t = s"lakehouse.gc.idchk$round"
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"CREATE TABLE $t (id BIGINT GENERATED ALWAYS AS IDENTITY, v INT, " +
        "CONSTRAINT small CHECK (id < 35))")
      // single input partition → dense mint from the mark: the winner
      // takes ids 1..20, so the loser's range (shifted or re-minted)
      // must cross 35 and die on the CHECK
      Seq.tabulate(20)(identity).toDF("v").coalesce(1)
        .createOrReplaceTempView(s"idchk_src$round")
      val inserts = (0 until 2).map { _ =>
        Future {
          try Right(spark.sql(
            s"INSERT INTO $t SELECT CAST(NULL AS BIGINT), v FROM idchk_src$round"))
          catch { case e: Exception => Left(rootCause(e).getMessage) }
        }
      }
      val results = inserts.map(Await.result(_, 120.seconds))
      val ids = spark.table(t).select($"id").as[Long].collect().toSeq
      withClue(s"round $round ($results): ") {
        results.count(_.isRight) shouldBe 1
        ids.length shouldBe 20
        ids.distinct.length shouldBe 20
        all(ids) should be < 35L // the CHECK held in this interleaving
        results.collect { case Left(msg) => msg }
          .foreach(_ should include("small"))
      }
      spark.sql(s"DROP TABLE $t")
    }
  }

  test("identity declaration racing a NULL-carrying INSERT: never both committed") {
    // the two halves of the defense: the declaration's no-rebase commit
    // verified no-nulls against its snapshot, and the INSERT commit
    // loop fails clean when the spec raced in after its rows were
    // written (TableMetadata.rebase likewise declines for every other
    // commitOrRebase writer) — so the final table can hold the
    // identity spec, or NULL ids, NEVER both
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.gc")
    for (round <- 0 until 3) {
      val t = s"lakehouse.gc.idrace2_$round"
      spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING)")
      spark.sql(s"INSERT INTO $t VALUES (1, 'seed')")
      Seq((Option.empty[Long], "raced")).toDF("id", "v")
        .createOrReplaceTempView(s"idrace2_src$round")

      val fIns = Future {
        try { spark.sql(s"INSERT INTO $t SELECT * FROM idrace2_src$round"); true }
        catch { case _: Throwable => false }
      }
      val fDdl = Future {
        try {
          spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES " +
            "('graft.identity.id'='100,1,true')")
          true
        } catch { case _: Throwable => false }
      }
      val insLanded = Await.result(fIns, 120.seconds)
      val ddlLanded = Await.result(fDdl, 120.seconds)

      val nulls = spark.table(t).where($"id".isNull).count()
      val declared = spark.sql(s"SHOW TBLPROPERTIES $t").collect()
        .exists(_.getString(0) == "graft.identity.id")
      withClue(s"round $round: ins=$insLanded ddl=$ddlLanded " +
        s"nulls=$nulls declared=$declared: ") {
        (declared && nulls > 0) shouldBe false
      }
      spark.sql(s"DROP TABLE $t")
    }
  }

  test("identity declaration refuses files whose stats cannot prove the column safe") {
    // a missing null count (or missing min/max on a non-empty file) is
    // UNVERIFIABLE, not zero: admitting it could commit NULL ids under
    // the declaration or under-advance the mint mark into collisions
    import graft.catalog.TableMetadata
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.gc")
    spark.sql("DROP TABLE IF EXISTS lakehouse.gc.idstats")
    spark.sql("CREATE TABLE lakehouse.gc.idstats (id BIGINT, v STRING)")
    spark.sql("INSERT INTO lakehouse.gc.idstats VALUES (1, 'a'), (2, 'b')")
    val dir = java.nio.file.Paths.get(TestSpark.warehouse, "gc", "idstats")
    val m = TableMetadata.load(dir)
    // simulate an external writer's footer: column present, null count absent
    val doctored = m.fileStats.map { case (f, cols) =>
      f -> cols.map { case (c, r) =>
        c -> (if (c == "id") r.copy(nulls = None) else r)
      }
    }
    TableMetadata.commit(dir, m.copy(version = m.version + 1,
      fileStats = doctored,
      snapshots = m.snapshots :+ graft.catalog.Snapshot(
        m.version + 1, System.currentTimeMillis(), "doctor", 0, m.files.size)))
    val e = intercept[Exception](
      spark.sql("ALTER TABLE lakehouse.gc.idstats SET TBLPROPERTIES " +
        "('graft.identity.id'='100,1,true')"))
    e.getMessage should include("unverifiable")
    spark.sql("DROP TABLE lakehouse.gc.idstats")
  }
}
