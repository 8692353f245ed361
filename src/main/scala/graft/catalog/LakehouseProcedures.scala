package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `CALL lakehouse.system.<proc>(...)` — the stored-procedure surface
  * for table maintenance, mirroring Iceberg's `system` procedures
  * (`rewrite_data_files`, `expire_snapshots`, `rollback_to_snapshot`)
  * on Spark 4's native ProcedureCatalog/CALL support:
  *
  *  - `compact(ns, tbl, target_files, cluster_by, zorder)`
  *  - `vacuum(ns, tbl, retain_versions, retention_ms)`
  *  - `rollback(ns, tbl, to_version)`
  *  - `rename_column(ns, tbl, old_name, new_name)`
  *
  * Nested namespaces are passed dot-joined (`'cat.db'`). Each
  * procedure is a thin SQL face over the corresponding
  * [[Maintenance]] op and returns its result as one row.
  */
object LakehouseProcedures {

  val Namespace: Array[String] = Array("system")

  private def param(name: String, dt: DataType) =
    ProcedureParameter.in(name, dt).build()
  private def param(name: String, dt: DataType, default: String) =
    ProcedureParameter.in(name, dt).defaultValue(default).build()

  /** One procedure instance per loadProcedure call: `catalogName` (the
    * registered name of the catalog the procedure was loaded from) is a
    * constructor value, NOT shared mutable state — with two
    * LakehouseCatalog registrations, a load racing a CALL must not
    * redirect the in-flight maintenance op to the other catalog's table. */
  private abstract class MaintenanceProc(
      procName: String,
      params: Array[ProcedureParameter],
      resultField: String,
      catalogName: String) extends UnboundProcedure with BoundProcedure {

    override def name(): String = procName
    override def description(): String = s"lakehouse maintenance: $procName"
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params
    override def isDeterministic: Boolean = false

    /** The op itself; returns the single result value. */
    def run(spark: SparkSession, catalogName: String, args: InternalRow): Long

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val spark = SparkSession.active
      val result = run(spark, catalogName, input)
      val scan: Scan = new LocalScan {
        override def readSchema(): StructType =
          StructType(Seq(StructField(resultField, LongType, nullable = false)))
        override def rows(): Array[InternalRow] = Array(InternalRow(result))
        override def description(): String = s"$procName result"
      }
      java.util.List.of(scan).iterator()
    }
  }

  private def ns(args: InternalRow): Seq[String] =
    args.getUTF8String(0).toString.split('.').toSeq
  private def tbl(args: InternalRow): String = args.getUTF8String(1).toString

  private def compactProc(catalogName: String) = new MaintenanceProc("compact",
    Array(
      param("ns", StringType), param("tbl", StringType),
      param("target_files", IntegerType, "1"),
      param("cluster_by", StringType, "''"),
      param("zorder", BooleanType, "false")), "files", catalogName) {
    override def run(spark: SparkSession, cat: String, a: InternalRow): Long = {
      val clusterBy = a.getUTF8String(3).toString match {
        case "" => Nil
        case s => s.split(',').map(_.trim).toSeq
      }
      Maintenance.compact(spark, cat, ns(a), tbl(a),
        targetFiles = a.getInt(2), clusterBy = clusterBy, zorder = a.getBoolean(4)).toLong
    }
  }

  private def vacuumProc(catalogName: String) = new MaintenanceProc("vacuum",
    Array(
      param("ns", StringType), param("tbl", StringType),
      param("retain_versions", IntegerType, "1"),
      param("retention_ms", LongType, Maintenance.DefaultRetentionMs.toString)),
    "deleted", catalogName) {
    override def run(spark: SparkSession, cat: String, a: InternalRow): Long =
      Maintenance.vacuum(spark, cat, ns(a), tbl(a),
        retainVersions = a.getInt(2), retentionMs = a.getLong(3)).toLong
  }

  private def rollbackProc(catalogName: String) = new MaintenanceProc("rollback",
    Array(
      param("ns", StringType), param("tbl", StringType),
      param("to_version", IntegerType)), "version", catalogName) {
    override def run(spark: SparkSession, cat: String, a: InternalRow): Long = {
      Maintenance.rollback(spark, cat, ns(a), tbl(a), toVersion = a.getInt(2))
      a.getInt(2).toLong
    }
  }

  private def renameColumnProc(catalogName: String) = new MaintenanceProc("rename_column",
    Array(
      param("ns", StringType), param("tbl", StringType),
      param("old_name", StringType), param("new_name", StringType)), "files", catalogName) {
    override def run(spark: SparkSession, cat: String, a: InternalRow): Long =
      Maintenance.renameColumn(spark, cat, ns(a), tbl(a),
        a.getUTF8String(2).toString, a.getUTF8String(3).toString).toLong
  }

  private def compactWhereProc(catalogName: String) = new MaintenanceProc("compact_where",
    Array(
      param("ns", StringType), param("tbl", StringType),
      param("col", StringType), param("value", StringType),
      param("target_files", IntegerType, "1")), "rewritten", catalogName) {
    override def run(spark: SparkSession, cat: String, a: InternalRow): Long =
      Maintenance.compactWhere(spark, cat, ns(a), tbl(a),
        Map(a.getUTF8String(2).toString -> a.getUTF8String(3).toString),
        targetFiles = a.getInt(4)).toLong
  }

  private def rewriteManifestsProc(catalogName: String) = new MaintenanceProc(
    "rewrite_manifests",
    Array(param("ns", StringType), param("tbl", StringType)), "manifests", catalogName) {
    override def run(spark: SparkSession, cat: String, a: InternalRow): Long =
      Maintenance.rewriteManifests(spark, cat, ns(a), tbl(a))
  }

  private def expireSnapshotsProc(catalogName: String) = new MaintenanceProc("expire_snapshots",
    Array(
      param("ns", StringType), param("tbl", StringType),
      param("retain_versions", IntegerType)), "expired", catalogName) {
    override def run(spark: SparkSession, cat: String, a: InternalRow): Long =
      Maintenance.expireSnapshots(spark, cat, ns(a), tbl(a), a.getInt(2)).toLong
  }

  private def exportIcebergProc(catalogName: String) = new MaintenanceProc("export_iceberg",
    Array(param("ns", StringType), param("tbl", StringType)), "files", catalogName) {
    override def run(spark: SparkSession, cat: String, a: InternalRow): Long =
      IcebergExport.export(spark, cat, ns(a), tbl(a))
  }

  private def importIcebergProc(catalogName: String) = new MaintenanceProc("import_iceberg",
    Array(
      param("ns", StringType), param("tbl", StringType),
      param("metadata_json", StringType),
      // optional branch/tag name from the document's refs map —
      // time-travel import (empty = the current snapshot)
      param("ref", StringType, "''"),
      // re-hash every bucket-claimed file's rows before committing
      // (default: trust the manifests, like every engine does)
      param("verify_buckets", BooleanType, "false")), "files", catalogName) {
    override def run(spark: SparkSession, cat: String, a: InternalRow): Long =
      IcebergImport.importTable(spark, cat, ns(a), tbl(a),
        a.getUTF8String(2).toString,
        Option(a.getUTF8String(3)).map(_.toString).filter(_.nonEmpty),
        verifyBuckets = a.getBoolean(4))
  }

  /** Read-only Iceberg REST catalog endpoint over this catalog's
    * warehouse (the reference's catalog is inspected over REST —
    * [[IcebergRestService]]). Returns the BOUND port; port 0 picks an
    * ephemeral one. */
  private def restStartProc(catalogName: String) = new MaintenanceProc(
    "start_rest_catalog",
    Array(param("port", IntegerType, "0")), "port", catalogName) {
    override def run(spark: SparkSession, cat: String, a: InternalRow): Long = {
      val wh = spark.sessionState.catalogManager.catalog(cat)
        .asInstanceOf[LakehouseCatalog].warehousePath
      // a query path that crashes between start and stop must not leak
      // the HttpServer past the session: the lifecycle hook closes any
      // still-running endpoint at application end
      IcebergRestService.installLifecycleHook(spark)
      IcebergRestService.register(wh, a.getInt(0)).toLong
    }
  }

  private def restStopProc(catalogName: String) = new MaintenanceProc(
    "stop_rest_catalog",
    Array(param("port", IntegerType)), "stopped", catalogName) {
    override def run(spark: SparkSession, cat: String, a: InternalRow): Long =
      if (IcebergRestService.stopPort(a.getInt(0))) 1L else 0L
  }

  private def bloomIndexProc(catalogName: String) = new MaintenanceProc("bloom_index",
    Array(
      param("ns", StringType), param("tbl", StringType),
      param("columns", StringType),
      param("expected_per_file", LongType, "1000000")), "sidecars", catalogName) {
    override def run(spark: SparkSession, cat: String, a: InternalRow): Long =
      BloomIndex.build(spark, cat, ns(a), tbl(a),
        a.getUTF8String(2).toString.split(',').map(_.trim).filter(_.nonEmpty).toSeq,
        a.getLong(3)).toLong
  }

  private def analyzeProc(catalogName: String) = new MaintenanceProc("analyze",
    Array(
      param("ns", StringType), param("tbl", StringType),
      param("columns", StringType, "''"),
      param("histogram_bins", IntegerType, "0")), "rows", catalogName) {
    override def run(spark: SparkSession, cat: String, a: InternalRow): Long = {
      val cols = a.getUTF8String(2).toString.split(',').map(_.trim).filter(_.nonEmpty).toSeq
      TableStats.analyze(spark, cat, ns(a), tbl(a), cols, histogramBins = a.getInt(3))
    }
  }

  /** String result (the maintenance mode used), so not a MaintenanceProc. */
  private def refreshMvProc(catalogName: String): UnboundProcedure =
    new UnboundProcedure with BoundProcedure {
      override def name(): String = "refresh_mv"
      override def description(): String = "fold source changes into a materialized view"
      override def bind(inputType: StructType): BoundProcedure = this
      override def parameters(): Array[ProcedureParameter] =
        Array(param("ns", StringType), param("tbl", StringType))
      override def isDeterministic: Boolean = false
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val spark = SparkSession.active
        val mode = MaterializedView.refresh(spark, catalogName, ns(input), tbl(input))
        val scan: Scan = new LocalScan {
          override def readSchema(): StructType =
            StructType(Seq(StructField("mode", StringType, nullable = false)))
          override def rows(): Array[InternalRow] =
            Array(InternalRow(UTF8String.fromString(mode)))
          override def description(): String = "refresh_mv result"
        }
        java.util.List.of(scan).iterator()
      }
    }

  /** SQL faces for the index operators — the same maintenance-
    * procedure shape Iceberg gives `rewrite_data_files`: build and
    * incremental-refresh are CALLable, searches stay DataFrame-level
    * (they return row sets, not a status). */
  private def stringResultProc(
      procName: String, desc: String, ps: Array[ProcedureParameter])(
      body: (SparkSession, InternalRow) => String): UnboundProcedure =
    new UnboundProcedure with BoundProcedure {
      override def name(): String = procName
      override def description(): String = desc
      override def bind(inputType: StructType): BoundProcedure = this
      override def parameters(): Array[ProcedureParameter] = ps
      override def isDeterministic: Boolean = false
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val mode = body(SparkSession.active, input)
        val scan: Scan = new LocalScan {
          override def readSchema(): StructType =
            StructType(Seq(StructField("mode", StringType, nullable = false)))
          override def rows(): Array[InternalRow] =
            Array(InternalRow(UTF8String.fromString(mode)))
          override def description(): String = s"$procName result"
        }
        java.util.List.of(scan).iterator()
      }
    }

  private def createTextIndexProc(catalogName: String): UnboundProcedure =
    stringResultProc("create_text_index",
      "build a positional postings index over a document table",
      Array(param("ns", StringType), param("tbl", StringType),
        param("index", StringType), param("text_col", StringType, "'text'"),
        param("id_col", StringType, "'doc_id'"),
        param("buckets", IntegerType, "64"))) { (spark, in) =>
      graft.operators.TextIndex.create(spark, catalogName, ns(in), tbl(in),
        in.getUTF8String(2).toString, in.getUTF8String(3).toString,
        in.getUTF8String(4).toString, in.getInt(5))
      "created"
    }

  private def refreshTextIndexProc(catalogName: String): UnboundProcedure =
    stringResultProc("refresh_text_index",
      "fold source commits into a postings index incrementally",
      Array(param("ns", StringType), param("index", StringType))) { (spark, in) =>
      graft.operators.TextIndex.refresh(spark, catalogName, ns(in), tbl(in))
    }

  private def createVectorIndexProc(catalogName: String): UnboundProcedure =
    stringResultProc("create_vector_index",
      "build an IVF ANN index over an embedding table",
      Array(param("ns", StringType), param("tbl", StringType),
        param("index", StringType), param("k", IntegerType, "16"),
        param("sample_n", IntegerType, "2048"),
        param("iters", IntegerType, "3"))) { (spark, in) =>
      graft.operators.VectorIndex.create(spark, catalogName, ns(in), tbl(in),
        in.getUTF8String(2).toString, in.getInt(3), in.getInt(4), in.getInt(5))
      "created"
    }

  private def refreshVectorIndexProc(catalogName: String): UnboundProcedure =
    stringResultProc("refresh_vector_index",
      "assign appended vectors into an IVF index, re-train on drift",
      Array(param("ns", StringType), param("index", StringType))) { (spark, in) =>
      graft.operators.VectorIndex.refresh(spark, catalogName, ns(in), tbl(in))
    }

  private def createPqIndexProc(catalogName: String): UnboundProcedure =
    stringResultProc("create_pq_index",
      "build an IVF-PQ ANN index (cells + product-quantization codes) over an " +
        "embedding table; refresh via refresh_vector_index",
      Array(param("ns", StringType), param("tbl", StringType),
        param("index", StringType), param("k", IntegerType, "16"),
        param("m", IntegerType, "8"), param("k_codes", IntegerType, "16"),
        param("sample_n", IntegerType, "2048"),
        param("iters", IntegerType, "3"))) { (spark, in) =>
      graft.operators.VectorIndex.createPq(spark, catalogName, ns(in), tbl(in),
        in.getUTF8String(2).toString, in.getInt(3), in.getInt(4), in.getInt(5),
        in.getInt(6), in.getInt(7))
      "created"
    }

  private def adcSearchProc(catalogName: String): UnboundProcedure =
    searchProc("adc_search",
      "PQ-ADC top-k cosine search answered from a persisted IVF-PQ index; " +
        "queries are index vec_ids (search-by-example), comma-separated",
      Array(param("ns", StringType), param("index", StringType),
        param("query_ids", StringType), param("k", IntegerType, "5"),
        param("shortlist_r", IntegerType, "40"))) { (spark, in) =>
      import org.apache.spark.sql.functions.col
      // the bounded driver set queryAdc contracts on: one row per
      // listed id, fetched by a stats-pruned id lookup on the index
      val ids = in.getUTF8String(2).toString.split(',')
        .map(_.trim).filter(_.nonEmpty).map(_.toLong).toSeq
      val idxFq = (catalogName +: ns(in) :+ in.getUTF8String(1).toString).mkString(".")
      val qs = spark.table(idxFq).filter(col("vec_id").isin(ids: _*))
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
      graft.operators.VectorIndex.queryAdc(spark, catalogName, ns(in),
        in.getUTF8String(1).toString, qs, in.getInt(3), in.getInt(4))
    }

  /** Rows-returning procedure: runs `body`'s DataFrame DISTRIBUTED
    * (probe scans, joins, top-k all execute as a normal Spark job) and
    * surfaces up to `limit` result rows through the CALL — the one
    * driver materialization is the bounded final answer, the same
    * contract as any top-k collect. This is the SQL face of the
    * q72-family searches: `CALL lakehouse.system.text_search('ns',
    * 'docs_idx', 'spark engine', 100)` needs no Scala at all. */
  private def searchProc(
      procName: String, desc: String, ps: Array[ProcedureParameter])(
      body: (SparkSession, InternalRow) => org.apache.spark.sql.DataFrame): UnboundProcedure =
    new UnboundProcedure with BoundProcedure {
      override def name(): String = procName
      override def description(): String = desc
      override def bind(inputType: StructType): BoundProcedure = this
      override def parameters(): Array[ProcedureParameter] = ps
      override def isDeterministic: Boolean = false
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val df = body(SparkSession.active, input)
        val out = df.schema
        val collected = df.queryExecution.executedPlan.executeCollect()
        val scan: Scan = new LocalScan {
          override def readSchema(): StructType = out
          override def rows(): Array[InternalRow] = collected
          override def description(): String = s"$procName result"
        }
        java.util.List.of(scan).iterator()
      }
    }

  /** Query strings tokenize exactly as the index build does (single-
    * space split, TextIndex.create) so SQL callers match the
    * DataFrame API term-for-term. */
  private def terms(in: InternalRow, i: Int): Seq[String] =
    in.getUTF8String(i).toString.split(' ').toSeq.filter(_.nonEmpty)

  private def textSearchProc(catalogName: String): UnboundProcedure =
    searchProc("text_search",
      "documents containing every query term (conjunctive), from the postings index",
      Array(param("ns", StringType), param("index", StringType),
        param("query", StringType), param("limit", IntegerType, "1000"))) { (spark, in) =>
      graft.operators.TextIndex.searchAll(spark, catalogName, ns(in),
        in.getUTF8String(1).toString, terms(in, 2)).limit(in.getInt(3))
    }

  private def phraseSearchProc(catalogName: String): UnboundProcedure =
    searchProc("phrase_search",
      "documents containing the exact phrase, from the positional postings",
      Array(param("ns", StringType), param("index", StringType),
        param("phrase", StringType), param("limit", IntegerType, "1000"))) { (spark, in) =>
      graft.operators.TextIndex.phraseSearch(spark, catalogName, ns(in),
        in.getUTF8String(1).toString, terms(in, 2)).limit(in.getInt(3))
    }

  private def rankedSearchProc(catalogName: String): UnboundProcedure =
    searchProc("ranked_search",
      "idf-ranked top-k keyword search from the postings index",
      Array(param("ns", StringType), param("index", StringType),
        param("query", StringType), param("k", IntegerType, "10"))) { (spark, in) =>
      graft.operators.TextIndex.searchRanked(spark, catalogName, ns(in),
        in.getUTF8String(1).toString, terms(in, 2), in.getInt(3))
    }

  private def bm25SearchProc(catalogName: String): UnboundProcedure =
    searchProc("bm25_search",
      "BM25 top-k keyword search from the postings index (tf + length norms)",
      Array(param("ns", StringType), param("index", StringType),
        param("query", StringType), param("k", IntegerType, "10"),
        param("k1", DoubleType, "1.2D"), param("b", DoubleType, "0.75D"))) { (spark, in) =>
      graft.operators.TextIndex.searchBM25(spark, catalogName, ns(in),
        in.getUTF8String(1).toString, terms(in, 2), in.getInt(3),
        in.getDouble(4), in.getDouble(5))
    }

  private def tagProc(catalogName: String) = new MaintenanceProc("tag",
    Array(
      param("ns", StringType), param("tbl", StringType),
      param("name", StringType), param("version", IntegerType),
      // per-ref retention (Iceberg max-ref-age-ms); -1/omitted = the
      // table default applies; 0 = NEVER ages (overrides the default)
      param("max_age_ms", LongType, "-1L")), "version", catalogName) {
    override def run(spark: SparkSession, cat: String, a: InternalRow): Long = {
      Maintenance.tag(spark, cat, ns(a), tbl(a), a.getUTF8String(2).toString, a.getInt(3),
        refAge(a.getLong(4)))
      a.getInt(3).toLong
    }
  }

  /** CALL-surface ref-age mapping: -1 (or omitted) = no per-ref age,
    * the table-wide default applies; 0 = never ages — stored as a
    * Long.MaxValue per-ref age so an explicit keep-forever request
    * survives a table-wide `graft.expire.max-ref-age-ms` default. */
  private def refAge(v: Long): Option[Long] =
    if (v < 0L) None else if (v == 0L) Some(Long.MaxValue) else Some(v)

  private def dropTagProc(catalogName: String) = new MaintenanceProc("drop_tag",
    Array(
      param("ns", StringType), param("tbl", StringType),
      param("name", StringType)), "dropped", catalogName) {
    override def run(spark: SparkSession, cat: String, a: InternalRow): Long = {
      Maintenance.dropTag(spark, cat, ns(a), tbl(a), a.getUTF8String(2).toString)
      1L
    }
  }

  private def branchProc(catalogName: String) = new MaintenanceProc("branch",
    Array(
      param("ns", StringType), param("tbl", StringType),
      param("name", StringType),
      // -1/omitted = table default; 0 = never ages (see refAge)
      param("max_age_ms", LongType, "-1L")), "fork_version", catalogName) {
    override def run(spark: SparkSession, cat: String, a: InternalRow): Long =
      Maintenance.createBranch(spark, cat, ns(a), tbl(a), a.getUTF8String(2).toString,
        refAge(a.getLong(3))).toLong
  }

  private def appendToBranchProc(catalogName: String) = new MaintenanceProc(
    "append_to_branch",
    Array(
      param("ns", StringType), param("tbl", StringType),
      param("name", StringType), param("rows_view", StringType)), "rows", catalogName) {
    override def run(spark: SparkSession, cat: String, a: InternalRow): Long =
      Maintenance.appendToBranch(spark, cat, ns(a), tbl(a),
        a.getUTF8String(2).toString, spark.table(a.getUTF8String(3).toString))
  }

  private def fastForwardProc(catalogName: String) = new MaintenanceProc("fast_forward",
    Array(
      param("ns", StringType), param("tbl", StringType),
      param("name", StringType)), "version", catalogName) {
    override def run(spark: SparkSession, cat: String, a: InternalRow): Long =
      Maintenance.fastForward(spark, cat, ns(a), tbl(a), a.getUTF8String(2).toString).toLong
  }

  private def dropBranchProc(catalogName: String) = new MaintenanceProc("drop_branch",
    Array(
      param("ns", StringType), param("tbl", StringType),
      param("name", StringType)), "dropped", catalogName) {
    override def run(spark: SparkSession, cat: String, a: InternalRow): Long = {
      Maintenance.dropBranch(spark, cat, ns(a), tbl(a), a.getUTF8String(2).toString)
      1L
    }
  }

  private def morDeleteProc(catalogName: String) = new MaintenanceProc("mor_delete",
    Array(
      param("ns", StringType), param("tbl", StringType),
      param("keys_view", StringType)), "key_rows", catalogName) {
    override def run(spark: SparkSession, cat: String, a: InternalRow): Long =
      MergeOnRead.morDelete(spark, cat, ns(a), tbl(a),
        spark.table(a.getUTF8String(2).toString))
  }

  /** Split a `SET`-style assignment list on top-level commas (commas
    * inside parens/brackets or single-quoted strings belong to the
    * expression), each part at its first `=`. */
  private[catalog] def parseAssignments(
      s: String): Map[String, org.apache.spark.sql.Column] = {
    val parts = scala.collection.mutable.Buffer[String]()
    val cur = new StringBuilder
    var depth = 0
    var quoted = false
    s.foreach {
      case '\'' => quoted = !quoted; cur += '\''
      case c @ ('(' | '[') if !quoted => depth += 1; cur += c
      case c @ (')' | ']') if !quoted => depth -= 1; cur += c
      case ',' if !quoted && depth == 0 => parts += cur.result(); cur.clear()
      case c => cur += c
    }
    parts += cur.result()
    parts.map(_.trim).filter(_.nonEmpty).map { p =>
      val i = p.indexOf('=')
      require(i > 0, s"malformed assignment: $p")
      p.take(i).trim -> org.apache.spark.sql.functions.expr(p.drop(i + 1).trim)
    }.toMap
  }

  private def autoCompactProc(catalogName: String) = new MaintenanceProc("auto_compact",
    Array(
      param("ns", StringType), param("tbl", StringType),
      param("target_file_bytes", LongType)), "rewritten", catalogName) {
    override def run(spark: SparkSession, cat: String, a: InternalRow): Long =
      Maintenance.autoCompact(spark, cat, ns(a), tbl(a), a.getLong(2)).toLong
  }

  private def piiAuditProc(catalogName: String) = new MaintenanceProc("pii_audit",
    Array(param("ns", StringType), param("tbl", StringType)), "flagged_columns", catalogName) {
    override def run(spark: SparkSession, cat: String, a: InternalRow): Long =
      PiiAudit.audit(spark, cat, ns(a), tbl(a)).size.toLong
  }

  private def morUpdateProc(catalogName: String) = new MaintenanceProc("mor_update",
    Array(
      param("ns", StringType), param("tbl", StringType),
      param("predicate", StringType), param("assignments", StringType)), "rows", catalogName) {
    override def run(spark: SparkSession, cat: String, a: InternalRow): Long =
      MergeOnRead.morUpdateWhere(spark, cat, ns(a), tbl(a),
        org.apache.spark.sql.functions.expr(a.getUTF8String(2).toString),
        LakehouseProcedures.parseAssignments(a.getUTF8String(3).toString))
  }

  private def addFilesProc(catalogName: String) = new MaintenanceProc("add_files",
    Array(
      param("ns", StringType), param("tbl", StringType),
      param("source_dir", StringType)), "files", catalogName) {
    override def run(spark: SparkSession, cat: String, a: InternalRow): Long =
      Maintenance.addFiles(spark, cat, ns(a), tbl(a),
        a.getUTF8String(2).toString).toLong
  }

  private def cloneTableProc(catalogName: String) = new MaintenanceProc("clone_table",
    Array(
      param("ns", StringType), param("tbl", StringType),
      param("dst_ns", StringType), param("dst_tbl", StringType)), "files", catalogName) {
    override def run(spark: SparkSession, cat: String, a: InternalRow): Long =
      Maintenance.cloneTable(spark, cat, ns(a), tbl(a),
        Seq(a.getUTF8String(2).toString), a.getUTF8String(3).toString).toLong
  }

  private def materializeDeletesProc(catalogName: String) =
    new MaintenanceProc("materialize_deletes",
      Array(param("ns", StringType), param("tbl", StringType)), "rewritten", catalogName) {
      override def run(spark: SparkSession, cat: String, a: InternalRow): Long =
        MergeOnRead.materializeDeletes(spark, cat, ns(a), tbl(a)).toLong
    }

  private def consolidateDeletesProc(catalogName: String) =
    new MaintenanceProc("consolidate_deletes",
      Array(param("ns", StringType), param("tbl", StringType)), "entries_removed", catalogName) {
      override def run(spark: SparkSession, cat: String, a: InternalRow): Long =
        MergeOnRead.consolidateDeletes(spark, cat, ns(a), tbl(a)).toLong
    }

  private def vectorizeDeletesProc(catalogName: String) =
    new MaintenanceProc("vectorize_deletes",
      Array(param("ns", StringType), param("tbl", StringType)), "vectorized", catalogName) {
      override def run(spark: SparkSession, cat: String, a: InternalRow): Long =
        MergeOnRead.vectorizeDeletes(spark,
          Maintenance.lakehouseTable(spark, cat, ns(a), tbl(a)).tableDir).toLong
    }

  private def setPartitioningProc(catalogName: String) = new MaintenanceProc("set_partitioning",
    Array(
      param("ns", StringType), param("tbl", StringType),
      param("columns", StringType)), "version", catalogName) {
    override def run(spark: SparkSession, cat: String, a: InternalRow): Long = {
      // paren-aware split: `truncate(4, tag)` is ONE entry
      Maintenance.setPartitioning(spark, cat, ns(a), tbl(a),
        a.getUTF8String(2).toString.split(",(?![^(]*\\))")
          .map(_.trim).filter(_.nonEmpty).toSeq)
      0L
    }
  }

  private def overwritePartitionsProc(catalogName: String) =
    new MaintenanceProc("overwrite_partitions",
      Array(
        param("ns", StringType), param("tbl", StringType),
        param("source_view", StringType)), "rows", catalogName) {
      override def run(spark: SparkSession, cat: String, a: InternalRow): Long = {
        val src = spark.table(a.getUTF8String(2).toString)
        Maintenance.overwritePartitions(spark, cat, ns(a), tbl(a), src)
        src.count()
      }
    }

  private val factories: Map[String, String => UnboundProcedure] = Map(
    "set_partitioning" -> (setPartitioningProc(_)),
    "overwrite_partitions" -> (overwritePartitionsProc(_)),
    "mor_delete" -> (morDeleteProc(_)),
    "mor_update" -> (morUpdateProc(_)),
    "pii_audit" -> (piiAuditProc(_)),
    "auto_compact" -> (autoCompactProc(_)),
    "materialize_deletes" -> (materializeDeletesProc(_)),
    "add_files" -> (addFilesProc(_)),
    "clone_table" -> (cloneTableProc(_)),
    "consolidate_deletes" -> (consolidateDeletesProc(_)),
    "vectorize_deletes" -> (vectorizeDeletesProc(_)),
    "tag" -> (tagProc(_)),
    "drop_tag" -> (dropTagProc(_)),
    "branch" -> (branchProc(_)),
    "append_to_branch" -> (appendToBranchProc(_)),
    "fast_forward" -> (fastForwardProc(_)),
    "drop_branch" -> (dropBranchProc(_)),
    "compact" -> (compactProc(_)),
    "vacuum" -> (vacuumProc(_)),
    "rollback" -> (rollbackProc(_)),
    "rename_column" -> (renameColumnProc(_)),
    "bloom_index" -> (bloomIndexProc(_)),
    "refresh_mv" -> (refreshMvProc(_)),
    "analyze" -> (analyzeProc(_)),
    "expire_snapshots" -> (expireSnapshotsProc(_)),
    "export_iceberg" -> (exportIcebergProc(_)),
    "import_iceberg" -> (importIcebergProc(_)),
    "start_rest_catalog" -> (restStartProc(_)),
    "stop_rest_catalog" -> (restStopProc(_)),
    "rewrite_manifests" -> (rewriteManifestsProc(_)),
    "compact_where" -> (compactWhereProc(_)),
    "create_text_index" -> (createTextIndexProc(_)),
    "refresh_text_index" -> (refreshTextIndexProc(_)),
    "create_vector_index" -> (createVectorIndexProc(_)),
    "refresh_vector_index" -> (refreshVectorIndexProc(_)),
    "create_pq_index" -> (createPqIndexProc(_)),
    "adc_search" -> (adcSearchProc(_)),
    "text_search" -> (textSearchProc(_)),
    "phrase_search" -> (phraseSearchProc(_)),
    "ranked_search" -> (rankedSearchProc(_)),
    "bm25_search" -> (bm25SearchProc(_)))

  def list(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Namespace))
      factories.keys.toArray.sorted.map(Identifier.of(Namespace, _))
    else Array.empty

  def load(ident: Identifier, catalogName: String): Option[UnboundProcedure] =
    if (ident.namespace.sameElements(Namespace))
      factories.get(ident.name).map(_(catalogName))
    else None
}
