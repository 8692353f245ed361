package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Replays the reference pipeline end-to-end against our catalog and
  * asserts its golden observables (SURVEY.md §5):
  * create namespace ×2 → create 12-col table → insert parquet-schema
  * data → query back, including the ANSI int→FLOAT `am=1.0` coercion
  * proven by notebook cell 7, and the metadata-log growth of cell 11.
  */
class CatalogSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** mtcars head, in the reference fixture's *parquet* schema (FIXTURES.md:
    * doubles + int32 `am`) — the DDL target narrows to FLOAT. */
  private def mtcarsSource() = {
    val schema = StructType(Seq(
      StructField("model", StringType), StructField("mpg", DoubleType),
      StructField("cyl", IntegerType), StructField("disp", DoubleType),
      StructField("hp", IntegerType), StructField("drat", DoubleType),
      StructField("wt", DoubleType), StructField("qsec", DoubleType),
      StructField("vs", IntegerType), StructField("am", IntegerType),
      StructField("gear", IntegerType), StructField("carb", IntegerType)))
    val rows = Seq(
      Row("Mazda RX4", 21.0, 6, 160.0, 110, 3.9, 2.62, 16.46, 0, 1, 4, 4),
      Row("Mazda RX4 Wag", 21.0, 6, 160.0, 110, 3.9, 2.875, 17.02, 0, 1, 4, 4),
      Row("Datsun 710", 22.8, 4, 108.0, 93, 3.85, 2.32, 18.61, 1, 1, 4, 1),
      Row("Hornet 4 Drive", 21.4, 6, 258.0, 110, 3.08, 3.215, 19.44, 1, 0, 3, 1))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
  }

  test("reference pipeline replay: namespaces, table DDL, insert coercion, scan") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.blms_cat")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.blms_cat.iceberg_dataset")
    // idempotence (reference runs every DDL with IF NOT EXISTS)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.blms_cat")

    spark.sql("""CREATE TABLE IF NOT EXISTS lakehouse.blms_cat.iceberg_dataset.cars
      (model STRING, mpg FLOAT, cyl INT, disp FLOAT, hp INT, drat FLOAT,
       wt FLOAT, qsec FLOAT, vs INT, am FLOAT, gear INT, carb INT)
      TBLPROPERTIES('bq_table'='ds.cars', 'has_pii'='false')""")
    spark.sql("""CREATE TABLE IF NOT EXISTS lakehouse.blms_cat.iceberg_dataset.cars
      (model STRING) """) // IF NOT EXISTS: no-op, no error

    mtcarsSource().createOrReplaceTempView("temp_view_car_data")
    spark.sql("""INSERT INTO lakehouse.blms_cat.iceberg_dataset.cars
      (model, mpg, cyl, disp, hp, drat, wt, qsec, vs, am, gear, carb)
      SELECT * FROM temp_view_car_data""")

    val out = spark.sql(
      "SELECT * FROM lakehouse.blms_cat.iceberg_dataset.cars ORDER BY model LIMIT 10")
    out.schema("am").dataType shouldBe FloatType // DDL narrowed double→FLOAT
    out.schema("mpg").dataType shouldBe FloatType
    val rows = out.collect()
    rows should have length 4
    val datsun = rows.find(_.getString(0) == "Datsun 710").get
    datsun.getFloat(1) shouldBe 22.8f // mpg double→float
    datsun.getFloat(9) shouldBe 1.0f  // am int→float: the cell-7 golden
    // DataFrame API twin (notebook cell 9 = cell 7)
    spark.table("lakehouse.blms_cat.iceberg_dataset.cars").count() shouldBe 4
  }

  test("metadata tables: log growth, history, snapshots, files") {
    val tbl = "lakehouse.blms_cat.iceberg_dataset.cars"
    mtcarsSource().createOrReplaceTempView("more_cars")
    spark.sql(s"INSERT INTO $tbl SELECT * FROM more_cars")
    spark.table(tbl).count() shouldBe 8 // append, not replace

    val log = spark.sql(s"SELECT * FROM $tbl.metadata_log_entries").collect()
    log.length should be >= 3 // create + 2 inserts
    log.count(_.getAs[Boolean]("is_current_version")) shouldBe 1

    val hist = spark.sql(s"SELECT * FROM $tbl.history ORDER BY version").collect()
    hist.map(_.getAs[String]("operation")).toSeq shouldBe Seq("create", "append", "append")

    val snaps = spark.sql(s"SELECT * FROM $tbl.snapshots ORDER BY version").collect()
    snaps.last.getAs[Int]("total_files") should be >= snaps.head.getAs[Int]("total_files")

    val files = spark.sql(s"SELECT * FROM $tbl.files").collect()
    files.length should be >= 2
    all(files.map(_.getAs[Long]("size_bytes"))) should be > 0L
  }

  test("partitions metadata table summarizes per-partition files/rows from metadata") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.blms_cat")
    spark.sql("CREATE TABLE lakehouse.blms_cat.pmt (k INT, v STRING) PARTITIONED BY (k)")
    // one commit per partition value → each file provably single-valued
    Seq(1, 2).foreach { k =>
      (0 until 10 * k).map(i => (k, s"v$k-$i")).toDF("k", "v")
        .createOrReplaceTempView("pmt_src")
      spark.sql("INSERT INTO lakehouse.blms_cat.pmt SELECT * FROM pmt_src")
    }
    val rows = spark.sql(
      "SELECT * FROM lakehouse.blms_cat.pmt.partitions ORDER BY partition").collect()
    rows.map(r => (r.getString(0), r.getInt(1), r.getLong(2))) shouldBe
      Array(("k=1", 1, 10L), ("k=2", 1, 20L))
    all(rows.map(_.getAs[Long]("bytes"))) should be > 0L

    // un-partitioned tables report one summary row
    spark.sql("CREATE TABLE lakehouse.blms_cat.pmt0 (k INT)")
    spark.range(5).selectExpr("CAST(id AS INT) AS k").createOrReplaceTempView("pmt0_src")
    spark.sql("INSERT INTO lakehouse.blms_cat.pmt0 SELECT * FROM pmt0_src")
    val r0 = spark.sql("SELECT * FROM lakehouse.blms_cat.pmt0.partitions").collect()
    r0.map(r => (r.getString(0), r.getLong(2))) shouldBe Array(("<unpartitioned>", 5L))
    spark.sql("DROP TABLE lakehouse.blms_cat.pmt")
    spark.sql("DROP TABLE lakehouse.blms_cat.pmt0")
  }

  test("insert overwrite replaces the snapshot, readers see old files until commit") {
    val tbl = "lakehouse.blms_cat.iceberg_dataset.cars"
    spark.sql(s"INSERT OVERWRITE $tbl SELECT * FROM temp_view_car_data")
    spark.table(tbl).count() shouldBe 4
    val hist = spark.sql(s"SELECT * FROM $tbl.history ORDER BY version").collect()
    hist.last.getAs[String]("operation") shouldBe "overwrite"
  }

  test("TRUNCATE TABLE empties the table as a new snapshot; history survives") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.blms_cat")
    spark.sql("CREATE TABLE lakehouse.blms_cat.trunc_t (k INT, v STRING)")
    Seq((1, "a"), (2, "b")).toDF("k", "v").createOrReplaceTempView("trunc_src")
    spark.sql("INSERT INTO lakehouse.blms_cat.trunc_t SELECT * FROM trunc_src")
    spark.table("lakehouse.blms_cat.trunc_t").count() shouldBe 2

    spark.sql("TRUNCATE TABLE lakehouse.blms_cat.trunc_t")
    spark.table("lakehouse.blms_cat.trunc_t").count() shouldBe 0
    // truncation is a snapshot, not an erasure: time travel still works
    spark.sql("SELECT * FROM lakehouse.blms_cat.trunc_t VERSION AS OF 2")
      .count() shouldBe 2
    spark.sql("DROP TABLE lakehouse.blms_cat.trunc_t")
  }

  test("persistent views: CREATE/SELECT/REPLACE/RENAME/SHOW/DROP VIEW in the catalog") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.blms_cat")
    spark.sql("CREATE TABLE lakehouse.blms_cat.vbase (k INT, v STRING)")
    Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v").createOrReplaceTempView("vbase_src")
    spark.sql("INSERT INTO lakehouse.blms_cat.vbase SELECT * FROM vbase_src")

    spark.sql(
      "CREATE VIEW lakehouse.blms_cat.big_k AS SELECT k, v FROM lakehouse.blms_cat.vbase WHERE k >= 2")
    spark.sql("SELECT * FROM lakehouse.blms_cat.big_k ORDER BY k")
      .collect().map(_.getInt(0)) shouldBe Array(2, 3)
    // the view tracks base-table changes (re-analyzed per query, not a copy)
    Seq((9, "z")).toDF("k", "v").createOrReplaceTempView("vbase_more")
    spark.sql("INSERT INTO lakehouse.blms_cat.vbase SELECT * FROM vbase_more")
    spark.sql("SELECT count(*) FROM lakehouse.blms_cat.big_k").collect()(0).getLong(0) shouldBe 3

    spark.sql("SHOW VIEWS IN lakehouse.blms_cat").collect()
      .map(_.getString(1)) should contain("big_k")

    spark.sql(
      "CREATE OR REPLACE VIEW lakehouse.blms_cat.big_k AS SELECT k FROM lakehouse.blms_cat.vbase WHERE k >= 3")
    spark.sql("SELECT * FROM lakehouse.blms_cat.big_k ORDER BY k")
      .collect().map(_.getInt(0)) shouldBe Array(3, 9)

    // rename via the ViewCatalog API (SQL ALTER VIEW RENAME routes
    // through the session-catalog path Spark reserves for v1 views)
    val vc = spark.sessionState.catalogManager.catalog("lakehouse")
      .asInstanceOf[graft.catalog.LakehouseCatalog]
    val vns = Array("blms_cat")
    vc.renameView(org.apache.spark.sql.connector.catalog.Identifier.of(vns, "big_k"),
      org.apache.spark.sql.connector.catalog.Identifier.of(vns, "huge_k"))
    spark.sql("SELECT count(*) FROM lakehouse.blms_cat.huge_k")
      .collect()(0).getLong(0) shouldBe 2
    intercept[Exception] { spark.table("lakehouse.blms_cat.big_k").collect() }

    // views survive catalog reload (persisted, not session state)
    spark.sessionState.catalogManager.catalog("lakehouse")
      .asInstanceOf[graft.catalog.LakehouseCatalog]
      .invalidateView(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("blms_cat"), "huge_k"))
    spark.sql("SELECT count(*) FROM lakehouse.blms_cat.huge_k")
      .collect()(0).getLong(0) shouldBe 2

    spark.sql("DROP VIEW lakehouse.blms_cat.huge_k")
    spark.sql("SHOW VIEWS IN lakehouse.blms_cat").collect()
      .map(_.getString(1)) should not contain "huge_k"
    spark.sql("DROP TABLE lakehouse.blms_cat.vbase")
  }

  test("views capture their definition context: relative names resolve at read time") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.vctx")
    spark.sql("CREATE TABLE lakehouse.vctx.base_t (k INT)")
    Seq(1, 2, 3).toDF("k").createOrReplaceTempView("vctx_src")
    spark.sql("INSERT INTO lakehouse.vctx.base_t SELECT * FROM vctx_src")
    val prevCat = spark.sessionState.catalogManager.currentCatalog.name()
    try {
      // define the view from INSIDE lakehouse.vctx with a bare table name
      spark.sql("USE lakehouse.vctx")
      spark.sql("CREATE VIEW rel_v AS SELECT k FROM base_t WHERE k >= 2")
      // read it from a completely different context: the stored
      // definition context must requalify `base_t`, not the reader's
      spark.sql(s"USE $prevCat")
      spark.sql("SELECT * FROM lakehouse.vctx.rel_v ORDER BY k")
        .collect().map(_.getInt(0)) shouldBe Array(2, 3)
    } finally {
      spark.sql(s"USE $prevCat")
      spark.sql("DROP VIEW IF EXISTS lakehouse.vctx.rel_v")
      spark.sql("DROP TABLE lakehouse.vctx.base_t")
    }
  }

  test("relative view names resolve against the current namespace") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.vctx2")
    spark.sql("CREATE TABLE lakehouse.vctx2.nt (k INT)")
    Seq(1, 2, 3).toDF("k").createOrReplaceTempView("vctx2_src")
    spark.sql("INSERT INTO lakehouse.vctx2.nt SELECT * FROM vctx2_src")
    val prevCat = spark.sessionState.catalogManager.currentCatalog.name()
    try {
      spark.sql("USE lakehouse.vctx2")
      spark.sql("CREATE VIEW bare_v AS SELECT k FROM nt WHERE k >= 2")
      // the DDL qualified the view into vctx2; a bare-name read from the
      // SAME namespace — the most common usage path — must find it
      spark.sql("SELECT * FROM bare_v ORDER BY k").collect()
        .map(_.getInt(0)) shouldBe Array(2, 3)
    } finally {
      spark.sql(s"USE $prevCat")
      spark.sql("DROP VIEW IF EXISTS lakehouse.vctx2.bare_v")
      spark.sql("DROP TABLE IF EXISTS lakehouse.vctx2.nt")
    }
  }

  test("names qualified with another catalog or global_temp bypass lakehouse view DDL") {
    val prevCat = spark.sessionState.catalogManager.currentCatalog.name()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.vctx3")
    try {
      spark.sql("USE lakehouse.vctx3")
      // global temp views live in Spark's registry, not our catalog —
      // DROP VIEW global_temp.x must route there even with a lakehouse
      // catalog current
      spark.sql("CREATE GLOBAL TEMPORARY VIEW gtv AS SELECT 42 AS x")
      spark.sql("SELECT x FROM global_temp.gtv").collect()(0).getInt(0) shouldBe 42
      spark.sql("DROP VIEW global_temp.gtv")
      intercept[Exception] { spark.sql("SELECT x FROM global_temp.gtv").collect() }
      spark.sql("SHOW VIEWS IN lakehouse.vctx3").collect() shouldBe empty

      // explicitly session-catalog-qualified CREATE VIEW is not hijacked
      spark.sql("CREATE VIEW spark_catalog.default.scv AS SELECT 7 AS y")
      spark.sql("SHOW VIEWS IN lakehouse.vctx3").collect() shouldBe empty
      spark.sql(s"USE $prevCat")
      spark.sql("SELECT y FROM default.scv").collect()(0).getInt(0) shouldBe 7
      spark.sql("DROP VIEW default.scv")
    } finally { spark.sql(s"USE $prevCat") }
  }

  test("view bodies requalify relations inside subqueries to the definition context") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.vctx4")
    spark.sql("CREATE TABLE lakehouse.vctx4.t1 (k INT)")
    spark.sql("CREATE TABLE lakehouse.vctx4.t2 (k INT)")
    Seq(1, 2, 3, 4).toDF("k").createOrReplaceTempView("v4a")
    spark.sql("INSERT INTO lakehouse.vctx4.t1 SELECT * FROM v4a")
    Seq(2, 4).toDF("k").createOrReplaceTempView("v4b")
    spark.sql("INSERT INTO lakehouse.vctx4.t2 SELECT * FROM v4b")
    val prevCat = spark.sessionState.catalogManager.currentCatalog.name()
    try {
      spark.sql("USE lakehouse.vctx4")
      spark.sql("CREATE VIEW subq_v AS SELECT k FROM t1 WHERE k IN (SELECT k FROM t2)")
      spark.sql(s"USE $prevCat")
      // the reader's context has no t2: the IN-subquery's relation must
      // have been requalified under the view's captured namespace
      spark.sql("SELECT * FROM lakehouse.vctx4.subq_v ORDER BY k").collect()
        .map(_.getInt(0)) shouldBe Array(2, 4)
    } finally {
      spark.sql(s"USE $prevCat")
      spark.sql("DROP VIEW IF EXISTS lakehouse.vctx4.subq_v")
      spark.sql("DROP TABLE IF EXISTS lakehouse.vctx4.t1")
      spark.sql("DROP TABLE IF EXISTS lakehouse.vctx4.t2")
    }
  }

  test("catalog introspection: SHOW CATALOGS / NAMESPACES / TABLES / TBLPROPERTIES") {
    spark.sql("SHOW CATALOGS").collect().map(_.getString(0)) should contain("lakehouse")
    spark.sql("SHOW NAMESPACES IN lakehouse").collect().map(_.getString(0)) should
      contain("blms_cat")
    spark.sql("SHOW NAMESPACES IN lakehouse.blms_cat").collect().map(_.getString(0)) should
      contain("blms_cat.iceberg_dataset")
    spark.sql("SHOW TABLES IN lakehouse.blms_cat.iceberg_dataset").collect()
      .map(_.getString(1)) should contain("cars")
    val props = spark.sql(
      "SHOW TBLPROPERTIES lakehouse.blms_cat.iceberg_dataset.cars").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    props("bq_table") shouldBe "ds.cars"
    props("has_pii") shouldBe "false" // the tag-template governance bit
  }

  test("alter table: set/unset properties, add/rename/drop column") {
    spark.sql("CREATE TABLE lakehouse.blms_cat.alter_t (a INT, b STRING)")
    val tbl = "lakehouse.blms_cat.alter_t"
    spark.sql(s"ALTER TABLE $tbl SET TBLPROPERTIES('k'='v')")
    spark.sql(s"SHOW TBLPROPERTIES $tbl").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap should contain("k" -> "v")
    spark.sql(s"ALTER TABLE $tbl UNSET TBLPROPERTIES('k')")
    spark.sql(s"ALTER TABLE $tbl ADD COLUMN c DOUBLE")
    spark.sql(s"ALTER TABLE $tbl RENAME COLUMN b TO b2")
    spark.sql(s"ALTER TABLE $tbl DROP COLUMN a")
    spark.table(tbl).schema.fieldNames.toSeq shouldBe Seq("b2", "c")
    spark.sql(s"DROP TABLE $tbl")
  }

  test("ALTER COLUMN: widening type change reads old files upcast; narrowing refused") {
    spark.sql("CREATE TABLE lakehouse.blms_cat.widen_t (a INT, b FLOAT)")
    Seq((1, 1.5f), (2, 2.5f)).toDF("a", "b").createOrReplaceTempView("widen_src")
    spark.sql("INSERT INTO lakehouse.blms_cat.widen_t SELECT * FROM widen_src")
    spark.sql("ALTER TABLE lakehouse.blms_cat.widen_t ALTER COLUMN a TYPE BIGINT")
    spark.sql("ALTER TABLE lakehouse.blms_cat.widen_t ALTER COLUMN b TYPE DOUBLE")
    val t = spark.table("lakehouse.blms_cat.widen_t")
    t.schema("a").dataType.simpleString shouldBe "bigint"
    // old int32/float files read back upcast, values intact
    t.orderBy("a").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq shouldBe
      Seq((1L, 1.5), (2L, 2.5))
    // and new appends in the widened type coexist with old files
    Seq((3000000000L, 3.5)).toDF("a", "b").createOrReplaceTempView("widen_src2")
    spark.sql("INSERT INTO lakehouse.blms_cat.widen_t SELECT * FROM widen_src2")
    spark.table("lakehouse.blms_cat.widen_t").count() shouldBe 3
    // narrowing is refused (Spark's analyzer rejects non-upcasts before
    // the catalog; our guard backstops any path that skips it)
    intercept[Exception] {
      spark.sql("ALTER TABLE lakehouse.blms_cat.widen_t ALTER COLUMN a TYPE INT")
    }
    spark.table("lakehouse.blms_cat.widen_t")
      .schema("a").dataType.simpleString shouldBe "bigint" // unchanged
    spark.sql("DROP TABLE lakehouse.blms_cat.widen_t")
  }

  test("RENAME COLUMN is refused once data files exist (name-based resolution)") {
    spark.sql("CREATE TABLE lakehouse.blms_cat.ren_t (a INT, b STRING)")
    Seq((1, "x")).toDF("a", "b").createOrReplaceTempView("ren_src")
    spark.sql("INSERT INTO lakehouse.blms_cat.ren_t SELECT * FROM ren_src")
    // a metadata-only rename would silently NULL column b for the row above
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE lakehouse.blms_cat.ren_t RENAME COLUMN b TO b2")
    }
    e.getMessage should include("RENAME COLUMN")
    // table unharmed: old name still reads its data
    spark.table("lakehouse.blms_cat.ren_t").select("b").collect().map(_.getString(0)) shouldBe
      Array("x")
    spark.sql("DROP TABLE lakehouse.blms_cat.ren_t")
  }

  test("metadata commit publish fails on existing version (no silent clobber)") {
    import graft.catalog.{Snapshot, TableMetadata}
    val dir = java.nio.file.Files.createTempDirectory("graft-commit-race")
    val schema = new org.apache.spark.sql.types.StructType().add("x", "int")
    def meta(op: String) = TableMetadata(
      version = 1, name = "race", schema = schema, partitionColumns = Nil,
      properties = Map.empty, files = Nil,
      snapshots = Seq(Snapshot(1, 0L, op, 0, 0)))
    TableMetadata.commit(dir, meta("winner"))
    // same-version publish must fail even though both racers passed the
    // exists() pre-check before either published (simulated by calling
    // the underlying publish again for the same version)
    intercept[IllegalStateException] { TableMetadata.commit(dir, meta("loser")) }
    TableMetadata.load(dir).snapshots.head.operation shouldBe "winner"
    // no temp-file litter left behind
    val litter = java.nio.file.Files.list(TableMetadata.metadataDir(dir)).iterator()
    val names = scala.jdk.CollectionConverters.IteratorHasAsScala(litter).asScala
      .map(_.getFileName.toString).toList
    names.filter(_.endsWith(".tmp")) shouldBe Nil
  }

  test("concurrent appends all succeed, serialized by the commit retry loop") {
    spark.sql("CREATE TABLE lakehouse.blms_cat.race_t (k INT, v STRING)")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val writers = (0 until 4).map { w =>
      Future {
        (0 until 3).foreach { i =>
          Seq((w * 10 + i, s"w$w-$i")).toDF("k", "v")
            .createOrReplaceTempView(s"race_src_$w")
          spark.sql(s"INSERT INTO lakehouse.blms_cat.race_t SELECT * FROM race_src_$w")
        }
      }
    }
    Await.result(Future.sequence(writers), 120.seconds)
    // every row landed exactly once; 12 append commits serialized
    spark.table("lakehouse.blms_cat.race_t").count() shouldBe 12
    spark.table("lakehouse.blms_cat.race_t").select("v").distinct().count() shouldBe 12
    val hist = spark.sql(
      "SELECT operation FROM lakehouse.blms_cat.race_t.history ORDER BY version").collect()
    hist.count(_.getString(0) == "append") shouldBe 12
    spark.sql("DROP TABLE lakehouse.blms_cat.race_t")
  }

  test("drop/rename table; drop namespace guards") {
    spark.sql("CREATE NAMESPACE lakehouse.tmp_ns")
    spark.sql("CREATE TABLE lakehouse.tmp_ns.t1 (x INT)")
    Seq(1, 2, 3).toDF("x").createOrReplaceTempView("xs")
    spark.sql("INSERT INTO lakehouse.tmp_ns.t1 SELECT * FROM xs")
    spark.sql("ALTER TABLE lakehouse.tmp_ns.t1 RENAME TO tmp_ns.t2")
    spark.table("lakehouse.tmp_ns.t2").count() shouldBe 3
    intercept[Exception] { spark.sql("DROP NAMESPACE lakehouse.tmp_ns") }
    spark.sql("DROP TABLE lakehouse.tmp_ns.t2")
    spark.sql("DROP NAMESPACE lakehouse.tmp_ns")
    spark.sql("SHOW NAMESPACES IN lakehouse").collect()
      .map(_.getString(0)) should not contain "tmp_ns"
  }

  test("partitioned table clusters files by key and pushes filters to parquet") {
    spark.sql("""CREATE TABLE lakehouse.blms_cat.part_t (k INT, v STRING)
      PARTITIONED BY (k)""")
    (1 to 1000).map(i => (i % 10, s"v$i")).toDF("k", "v")
      .createOrReplaceTempView("kv")
    spark.sql("INSERT INTO lakehouse.blms_cat.part_t SELECT * FROM kv")
    val q = spark.table("lakehouse.blms_cat.part_t").where($"k" === 3)
    q.count() shouldBe 100
    val plan = q.queryExecution.executedPlan.toString
    plan should include("PushedFilters")
    plan should include("k")
    spark.sql("DROP TABLE lakehouse.blms_cat.part_t")
  }

  test("multimodal columns: binary payload + struct metadata round-trip") {
    spark.sql("""CREATE TABLE lakehouse.blms_cat.media (
      id BIGINT, payload BINARY,
      meta STRUCT<mime: STRING, width: INT, height: INT>,
      tags ARRAY<STRING>)""")
    val df = Seq(
      (1L, Array[Byte](1, 2, 3), ("image/png", 640, 480), Seq("cat", "indoor")),
      (2L, Array[Byte](9, 9), ("audio/wav", 0, 0), Seq("speech")))
      .toDF("id", "payload", "meta", "tags")
      .selectExpr("id", "payload",
        "named_struct('mime', meta._1, 'width', meta._2, 'height', meta._3) AS meta",
        "tags")
    df.createOrReplaceTempView("media_src")
    spark.sql("INSERT INTO lakehouse.blms_cat.media SELECT * FROM media_src")
    val back = spark.sql(
      "SELECT id, meta.mime, octet_length(payload) AS len FROM lakehouse.blms_cat.media ORDER BY id")
      .collect()
    back.map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq shouldBe
      Seq((1L, "image/png", 3), (2L, "audio/wav", 2))
    spark.sql("DROP TABLE lakehouse.blms_cat.media")
  }

  test("CTAS creates and populates in one statement") {
    spark.sql("""CREATE TABLE lakehouse.blms_cat.ctas_t AS
      SELECT id AS k, id * 2 AS v FROM range(100)""")
    spark.table("lakehouse.blms_cat.ctas_t").count() shouldBe 100
    spark.sql("SELECT sum(v) FROM lakehouse.blms_cat.ctas_t")
      .collect()(0).getLong(0) shouldBe 9900L
    spark.sql("DROP TABLE lakehouse.blms_cat.ctas_t")
  }

  test("DESCRIBE shows schema, partitioning and properties (R17 surface)") {
    spark.sql("""CREATE TABLE lakehouse.blms_cat.desc_t (a INT, b STRING)
      PARTITIONED BY (a) TBLPROPERTIES('has_pii'='false')""")
    val desc = spark.sql("DESCRIBE EXTENDED lakehouse.blms_cat.desc_t")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    desc("a") shouldBe "int"
    desc("b") shouldBe "string"
    val full = spark.sql("DESCRIBE EXTENDED lakehouse.blms_cat.desc_t")
      .collect().map(_.mkString("|")).mkString("\n")
    full should include("a") // partition listing carries the column
    spark.sql("DROP TABLE lakehouse.blms_cat.desc_t")
  }

  test("time travel: VERSION AS OF and TIMESTAMP AS OF read old snapshots") {
    spark.sql("CREATE TABLE lakehouse.blms_cat.tt (x INT)")
    (1 to 3).foreach { i =>
      Seq(i).toDF("x").createOrReplaceTempView("tt_src")
      spark.sql("INSERT INTO lakehouse.blms_cat.tt SELECT * FROM tt_src")
    }
    spark.table("lakehouse.blms_cat.tt").count() shouldBe 3
    // v1 = create (empty), v2 = first insert, v3 = two rows
    spark.sql("SELECT * FROM lakehouse.blms_cat.tt VERSION AS OF 1").count() shouldBe 0
    spark.sql("SELECT * FROM lakehouse.blms_cat.tt VERSION AS OF 2").count() shouldBe 1
    spark.sql("SELECT * FROM lakehouse.blms_cat.tt VERSION AS OF 3").count() shouldBe 2
    val asOfNow = spark.sql(
      "SELECT * FROM lakehouse.blms_cat.tt TIMESTAMP AS OF current_timestamp()").count()
    asOfNow shouldBe 3
    intercept[Exception] {
      spark.sql("SELECT * FROM lakehouse.blms_cat.tt VERSION AS OF 99").collect()
    }
    spark.sql("DROP TABLE lakehouse.blms_cat.tt")
  }

  test("concurrent commits: losing writer gets a conflict, not silent clobber") {
    import graft.catalog.{Snapshot, TableMetadata}
    import java.nio.file.Paths
    spark.sql("CREATE TABLE lakehouse.blms_cat.conflict_t (x INT)")
    val dir = Paths.get(TestSpark.warehouse, "blms_cat", "conflict_t")
    val base = TableMetadata.load(dir)
    val next = base.copy(version = base.version + 1,
      snapshots = base.snapshots :+ Snapshot(base.version + 1, 1L, "append", 0, 0))
    TableMetadata.commit(dir, next)
    intercept[IllegalStateException] { TableMetadata.commit(dir, next) }
    spark.sql("DROP TABLE lakehouse.blms_cat.conflict_t")
  }

  test("the __graft_ column prefix is refused at CREATE and ADD COLUMN") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.cat_ns")
    // MoR/CDC internals project working columns under __graft_ with
    // withColumn, which silently REPLACES a same-named user column —
    // the DDL refusal turns would-be silent corruption into an error
    val e1 = intercept[Exception](spark.sql(
      "CREATE TABLE lakehouse.cat_ns.badcol (k INT, __graft_uf STRING)"))
    e1.getMessage should include("__graft_")
    spark.sql("CREATE TABLE lakehouse.cat_ns.badcol2 (k INT)")
    val e2 = intercept[Exception](spark.sql(
      "ALTER TABLE lakehouse.cat_ns.badcol2 ADD COLUMN __graft_pos BIGINT"))
    e2.getMessage should include("__graft_")
    spark.sql("DROP TABLE lakehouse.cat_ns.badcol2")
  }
}
