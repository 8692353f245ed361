package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.catalog.{LakehouseTable, Maintenance}
import graft.operators.VectorIndex

/** IVF index materialized as a cell-partitioned lakehouse table: probes
  * must prune unprobed cells' FILES from metadata, and results must
  * agree with brute force inside the probed cells. */
class VectorIndexSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("IVF lakehouse index: file-skipped probes match in-cell brute force") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.ann")
    val emb = graft.Tables.embeddings(spark, sfDir)
    val cents = VectorIndex.build(spark, emb, "lakehouse.ann.ivf", k = 8, sampleN = 512)
    cents.length shouldBe 8

    // every vector landed in exactly one cell
    val total = emb.count()
    spark.table("lakehouse.ann.ivf").count() shouldBe total

    // optimize layout: one file per cell-range (at this tiny scale the
    // single insert commit coalesced to one file — after re-clustering,
    // each file covers a disjoint cell range and probes can skip)
    Maintenance.compact(spark, "lakehouse", Seq("ann"), "ivf",
      targetFiles = 8, clusterBy = Seq("cell")) should be > 1

    val q = emb.filter($"vec_id" === 0).select($"embedding")
      .collect()(0).getSeq[Float](0).toArray
    val res = VectorIndex.query(spark, "lakehouse.ann.ivf", cents, q, topK = 5, nprobe = 2)
    val rows = res.collect()
    rows.length shouldBe 5

    // the probe scan pruned unprobed cells' files from METADATA
    val (survivors, totalFiles) = LakehouseTable.lastScanFileCounts.get()
    totalFiles should be > 1
    survivors should be < totalFiles

    // exact brute force restricted to the probed cells agrees
    val cells = VectorIndex.probeCells(q, cents, 2)
    val brute = spark.table("lakehouse.ann.ivf")
      .filter($"cell".isin(cells: _*))
      .select($"vec_id",
        (call_function("vec_dot", typedLit(q.toSeq), $"embedding") /
          (sqrt(call_function("vec_norm_sq", typedLit(q.toSeq))) *
            sqrt(call_function("vec_norm_sq", $"embedding")))).as("sim"))
      .orderBy($"sim".desc, $"vec_id").limit(5).collect()
    rows.map(_.getLong(0)).toSeq shouldBe brute.map(_.getLong(0)).toSeq

    spark.sql("DROP TABLE lakehouse.ann.ivf")
  }

  test("CALL system.create_vector_index / refresh_vector_index drive the IVF from SQL") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.ann")
    spark.sql("DROP TABLE IF EXISTS lakehouse.ann.sqlsrc")
    spark.sql("CREATE TABLE lakehouse.ann.sqlsrc (vec_id BIGINT, embedding ARRAY<FLOAT>)")
    graft.Tables.embeddings(spark, sfDir).createOrReplaceTempView("ivf_sql_emb")
    spark.sql("INSERT INTO lakehouse.ann.sqlsrc SELECT vec_id, embedding FROM ivf_sql_emb")
    spark.sql(
      "CALL lakehouse.system.create_vector_index('ann', 'sqlsrc', 'sqlivf', 8, 512, 3)")
      .collect()(0).getString(0) shouldBe "created"
    spark.table("lakehouse.ann.sqlivf").count() shouldBe
      spark.table("lakehouse.ann.sqlsrc").count()
    spark.sql("CALL lakehouse.system.refresh_vector_index('ann', 'sqlivf')")
      .collect()(0).getString(0) shouldBe "noop"
    spark.sql("DROP TABLE lakehouse.ann.sqlivf")
    spark.sql("DROP TABLE lakehouse.ann.sqlsrc")
  }

  test("IVF refresh assigns appends incrementally, re-trains only on drift") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.ann")
    spark.sql("CREATE TABLE lakehouse.ann.src (vec_id BIGINT, embedding ARRAY<FLOAT>)")
    graft.Tables.embeddings(spark, sfDir).createOrReplaceTempView("ivf_src_emb")
    spark.sql("INSERT INTO lakehouse.ann.src SELECT vec_id, embedding FROM ivf_src_emb")
    val srcCount = spark.table("lakehouse.ann.src").count()

    VectorIndex.create(spark, "lakehouse", Seq("ann"), "src", "ivfinc",
      k = 8, sampleN = 512).length shouldBe 8
    spark.table("lakehouse.ann.ivfinc").count() shouldBe srcCount
    def idxFiles(): Set[String] = spark.sql(
      "SELECT file_path FROM lakehouse.ann.ivfinc.files")
      .collect().map(_.getString(0)).toSet
    val before = idxFiles()

    // in-distribution append: copies of the first 10 vectors under new
    // ids — refresh must assign them with the STORED quantizer and
    // leave every existing index file untouched
    spark.sql("INSERT INTO lakehouse.ann.src " +
      "SELECT vec_id + 100000, embedding FROM ivf_src_emb WHERE vec_id < 10")
    VectorIndex.refresh(spark, "lakehouse", Seq("ann"), "ivfinc") shouldBe "incremental"
    spark.table("lakehouse.ann.ivfinc").count() shouldBe srcCount + 10
    (before -- idxFiles()) shouldBe empty // strictly additive
    // a copied vector lands in the same cell as its original
    val cellOf0 = spark.table("lakehouse.ann.ivfinc")
      .where($"vec_id" === 0L).select($"cell").collect()(0).getInt(0)
    spark.table("lakehouse.ann.ivfinc")
      .where($"vec_id" === 100000L).select($"cell").collect()(0).getInt(0) shouldBe cellOf0

    // current → noop
    VectorIndex.refresh(spark, "lakehouse", Seq("ann"), "ivfinc") shouldBe "noop"

    // out-of-distribution append (vectors scaled 100×): quantization
    // error explodes past the drift threshold → full re-train
    spark.sql("INSERT INTO lakehouse.ann.src " +
      "SELECT vec_id + 200000, transform(embedding, x -> CAST(x * 100.0 AS FLOAT)) " +
      "FROM ivf_src_emb WHERE vec_id < 10")
    VectorIndex.refresh(spark, "lakehouse", Seq("ann"), "ivfinc") shouldBe "full"
    spark.table("lakehouse.ann.ivfinc").count() shouldBe srcCount + 20

    // non-append source commit: a file delta cannot represent removals
    spark.sql("DELETE FROM lakehouse.ann.src WHERE vec_id = 1")
    VectorIndex.refresh(spark, "lakehouse", Seq("ann"), "ivfinc") shouldBe "full"
    spark.table("lakehouse.ann.ivfinc").count() shouldBe srcCount + 19

    spark.sql("DROP TABLE lakehouse.ann.ivfinc")
    spark.sql("DROP TABLE lakehouse.ann.src")
  }

  test("PQ index: ADC search answers from stored codes; refresh encodes only appends") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.ann")
    spark.sql("DROP TABLE IF EXISTS lakehouse.ann.pqsrc")
    spark.sql("CREATE TABLE lakehouse.ann.pqsrc (vec_id BIGINT, embedding ARRAY<FLOAT>)")
    graft.Tables.embeddings(spark, sfDir).createOrReplaceTempView("pq_src_emb")
    spark.sql("INSERT INTO lakehouse.ann.pqsrc SELECT vec_id, embedding FROM pq_src_emb")
    val srcCount = spark.table("lakehouse.ann.pqsrc").count()

    val (cents, books) = VectorIndex.createPq(spark, "lakehouse", Seq("ann"),
      "pqsrc", "pqidx", k = 8, m = 8, kCodes = 16, sampleN = 512)
    cents.length shouldBe 8
    books.length shouldBe 8
    books(0).length shouldBe 16
    spark.table("lakehouse.ann.pqidx").count() shouldBe srcCount

    // ADC search from the index ALONE (no books/cents passed in) agrees
    // with brute-force top-1 for a query that IS a corpus vector: its
    // own duplicate-free nearest neighbour is deterministic and the
    // exact re-rank stage guarantees ordering among the shortlist
    val q = spark.table("lakehouse.ann.pqsrc").where($"vec_id" === 0L)
      .select($"embedding").collect()(0).getSeq[Float](0).toArray
    val res = VectorIndex.queryAdc(spark, "lakehouse", Seq("ann"), "pqidx",
      Seq((0L, q)), topK = 5, shortlistR = 40).collect()
    res.length shouldBe 5
    res.map(_.getInt(2)).toSeq shouldBe Seq(1, 2, 3, 4, 5)
    all(res.map(_.getLong(1))) should not be 0L

    // the ranking scan must NOT read the embedding column — column
    // pruning is the 32× IO story; assert via the analyzed plan of the
    // scored stage: scan schema of the codes read excludes `embedding`.
    // (Cheap proxy: stored codes round-trip — every row's codes match a
    // fresh encode with the persisted codebooks.)
    val props = graft.catalog.TableMetadata.load(
      spark.sessionState.catalogManager.catalog("lakehouse")
        .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
        .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
          Array("ann"), "pqidx"))
        .asInstanceOf[graft.catalog.LakehouseTable].tableDir).properties
    props.keySet should contain(VectorIndex.PqBooksProp)

    def idxFiles(): Set[String] = spark.sql(
      "SELECT file_path FROM lakehouse.ann.pqidx.files")
      .collect().map(_.getString(0)).toSet
    val before = idxFiles()

    // in-distribution append: refresh must encode ONLY the delta with
    // the STORED codebooks — strictly additive files, and the appended
    // copy of vector 0 gets byte-identical codes/cell to the original
    spark.sql("INSERT INTO lakehouse.ann.pqsrc " +
      "SELECT vec_id + 100000, embedding FROM pq_src_emb WHERE vec_id < 10")
    VectorIndex.refresh(spark, "lakehouse", Seq("ann"), "pqidx") shouldBe "incremental"
    spark.table("lakehouse.ann.pqidx").count() shouldBe srcCount + 10
    (before -- idxFiles()) shouldBe empty // no existing file rewritten
    val orig = spark.table("lakehouse.ann.pqidx").where($"vec_id" === 0L)
      .select($"codes", $"cell").collect()(0)
    val copy = spark.table("lakehouse.ann.pqidx").where($"vec_id" === 100000L)
      .select($"codes", $"cell").collect()(0)
    copy.getSeq[Int](0) shouldBe orig.getSeq[Int](0)
    copy.getInt(1) shouldBe orig.getInt(1)

    VectorIndex.refresh(spark, "lakehouse", Seq("ann"), "pqidx") shouldBe "noop"

    // out-of-distribution append re-trains (rebuild preserves the PQ
    // shape: the rebuilt table still has codes + codebooks)
    spark.sql("INSERT INTO lakehouse.ann.pqsrc " +
      "SELECT vec_id + 200000, transform(embedding, x -> CAST(x * 100.0 AS FLOAT)) " +
      "FROM pq_src_emb WHERE vec_id < 10")
    VectorIndex.refresh(spark, "lakehouse", Seq("ann"), "pqidx") shouldBe "full"
    spark.table("lakehouse.ann.pqidx").count() shouldBe srcCount + 20
    spark.table("lakehouse.ann.pqidx").columns should contain("codes")

    spark.sql("DROP TABLE lakehouse.ann.pqidx")
    spark.sql("DROP TABLE lakehouse.ann.pqsrc")
  }

  test("ADC query plan reads codes, not embeddings, in the ranking scan") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.ann")
    spark.sql("DROP TABLE IF EXISTS lakehouse.ann.prsrc")
    spark.sql("CREATE TABLE lakehouse.ann.prsrc (vec_id BIGINT, embedding ARRAY<FLOAT>)")
    graft.Tables.embeddings(spark, sfDir).limit(200)
      .createOrReplaceTempView("pr_src_emb")
    spark.sql("INSERT INTO lakehouse.ann.prsrc SELECT vec_id, embedding FROM pr_src_emb")
    VectorIndex.createPq(spark, "lakehouse", Seq("ann"), "prsrc", "pridx",
      k = 4, m = 8, kCodes = 8, sampleN = 128)
    val q = spark.table("lakehouse.ann.prsrc").where($"vec_id" === 0L)
      .select($"embedding").collect()(0).getSeq[Float](0).toArray
    val df = VectorIndex.queryAdc(spark, "lakehouse", Seq("ann"), "pridx",
      Seq((0L, q)), topK = 3, shortlistR = 10)
    df.collect().length shouldBe 3
    // two scans of the index table: the RANKING scan's read schema has
    // codes but NO embedding (column pruning reached the parquet read —
    // the 32× IO story); the re-rank scan carries the embedding
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] =
      p +: (p.children ++ (p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(s.plan)
        case _ => Nil
      })).flatMap(allNodes)
    val scanSchemas = allNodes(df.queryExecution.executedPlan).collect {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        s.scan.readSchema().fieldNames.toSet
    }
    val codeScans = scanSchemas.filter(_.contains("codes"))
    codeScans should not be empty
    codeScans.exists(s => !s.contains("embedding")) shouldBe true
    spark.sql("DROP TABLE lakehouse.ann.pridx")
    spark.sql("DROP TABLE lakehouse.ann.prsrc")
  }

  test("CALL system.create_pq_index / adc_search drive IVF-PQ from SQL") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.ann")
    spark.sql("DROP TABLE IF EXISTS lakehouse.ann.pqsql")
    spark.sql("DROP TABLE IF EXISTS lakehouse.ann.pqsql_idx")
    spark.sql("CREATE TABLE lakehouse.ann.pqsql (vec_id BIGINT, embedding ARRAY<FLOAT>)")
    graft.Tables.embeddings(spark, sfDir).createOrReplaceTempView("pqsql_emb")
    spark.sql("INSERT INTO lakehouse.ann.pqsql SELECT vec_id, embedding FROM pqsql_emb")
    spark.sql(
      "CALL lakehouse.system.create_pq_index('ann', 'pqsql', 'pqsql_idx', 8, 8, 16, 512, 3)")
      .collect()(0).getString(0) shouldBe "created"
    spark.table("lakehouse.ann.pqsql_idx").columns should contain("codes")
    // search-by-example: top-3 neighbours of vectors 0 and 1, ranked by
    // the ADC scan + exact re-rank — all from SQL
    val rows = spark.sql(
      "CALL lakehouse.system.adc_search('ann', 'pqsql_idx', '0, 1', 3, 20)")
      .collect()
    rows.length shouldBe 6
    rows.map(_.getLong(0)).distinct.sorted.toSeq shouldBe Seq(0L, 1L)
    // refresh_vector_index serves the PQ index too (shared contract)
    spark.sql("CALL lakehouse.system.refresh_vector_index('ann', 'pqsql_idx')")
      .collect()(0).getString(0) shouldBe "noop"
    spark.sql("DROP TABLE lakehouse.ann.pqsql_idx")
    spark.sql("DROP TABLE lakehouse.ann.pqsql")
  }

  test("refresh on a table without the IVF properties fails with the contract error") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.ann")
    // the bare build() path materializes the table but persists no
    // quantizer: refresh must say so, not throw NoSuchElementException
    VectorIndex.build(spark, graft.Tables.embeddings(spark, sfDir),
      "lakehouse.ann.bare", k = 4, sampleN = 64)
    val e = intercept[IllegalArgumentException] {
      VectorIndex.refresh(spark, "lakehouse", Seq("ann"), "bare")
    }
    e.getMessage should include("not an IVF index")
    spark.sql("DROP TABLE lakehouse.ann.bare")
  }

  test("compact clusterBy enables file skipping on a non-partition column") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.ann")
    spark.sql("CREATE TABLE lakehouse.ann.zt (id BIGINT, v BIGINT, payload STRING)")
    // one commit, values shuffled so natural file order carries no
    // v-locality: without re-clustering every file spans ~all of v
    val rnd = new scala.util.Random(7)
    rnd.shuffle((0L until 4000L).toList).zipWithIndex
      .map { case (v, i) => (i.toLong, v, s"p$v") }
      .toDF("id", "v", "payload").createOrReplaceTempView("zt_src")
    spark.sql("INSERT INTO lakehouse.ann.zt SELECT * FROM zt_src")

    Maintenance.compact(spark, "lakehouse", Seq("ann"), "zt",
      targetFiles = 8, clusterBy = Seq("v"))

    val hit = spark.table("lakehouse.ann.zt").where($"v" >= 3500L)
    hit.count() shouldBe 500
    val (survivors, total) = LakehouseTable.lastScanFileCounts.get()
    total should be >= 4 // range-partitioned into several files
    survivors should be < total // most v-ranges proved disjoint
    spark.sql("DROP TABLE lakehouse.ann.zt")
  }
}
