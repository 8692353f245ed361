package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.avro.generic.GenericRecord
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.catalog.IcebergExport

/** `CALL system.export_iceberg`: a spec-conformant Apache Iceberg v2
  * snapshot of the current version, readable by external engines with
  * no graft code. No Iceberg reader ships in this offline image
  * (DuckDB's iceberg extension needs a download; no iceberg-spark jar),
  * so the strongest available check is what these tests do: re-enact
  * the Iceberg read protocol FROM THE EXPORTED ARTIFACTS ALONE —
  * version-hint → metadata.json → manifest-list Avro → manifest Avro →
  * data/delete parquet, applying deletes by the spec's sequence-number
  * rules — and demand row-set equality with our own scan of the same
  * MoR-dirty table, plus field-by-field conformance pins on the
  * metadata (the exact keys/ids the Iceberg Table Spec mandates). */
class IcebergExportSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tableDir(t: String) = Paths.get(TestSpark.warehouse, "ice_ns", t)

  private def readJson(p: java.nio.file.Path): Map[String, JValue] =
    JsonMethods.parse(Files.readString(p)).asInstanceOf[JObject].obj.toMap

  private def jstr(v: JValue): String = v.asInstanceOf[JString].s
  private def jlong(v: JValue): Long = v match {
    case JInt(i) => i.toLong
    case JLong(l) => l
    case other => other.values.toString.toLong
  }

  /** The read protocol, from artifacts alone: returns (rows as sorted
    * strings) for comparison against our scan. */
  private def icebergRead(dir: java.nio.file.Path, cols: Seq[String]): Seq[String] = {
    val md = dir.resolve("metadata")
    val hint = Files.readString(md.resolve("version-hint.text")).trim.toInt
    val meta = readJson(md.resolve(s"v$hint.metadata.json"))
    meta("format-version") shouldBe JInt(2)
    val snapId = jlong(meta("current-snapshot-id"))
    val snap = meta("snapshots").asInstanceOf[JArray].arr
      .map(_.asInstanceOf[JObject].obj.toMap)
      .find(s => jlong(s("snapshot-id")) == snapId).get
    val listPath = Paths.get(java.net.URI.create(jstr(snap("manifest-list"))))
    val (manifests, listMeta) = IcebergExport.readAvro(listPath)
    listMeta("format-version") shouldBe "2"

    final case class FileRef(path: String, content: Int, seq: Long,
        equalityIds: Seq[Int])
    val refs = manifests.flatMap { m =>
      val mPath = Paths.get(java.net.URI.create(m.get("manifest_path").toString))
      val (entries, mMeta) = IcebergExport.readAvro(mPath)
      mMeta("format-version") shouldBe "2"
      mMeta.keySet should contain allOf ("schema", "partition-spec", "content")
      entries.map { e =>
        val df = e.get("data_file").asInstanceOf[GenericRecord]
        FileRef(
          df.get("file_path").toString,
          df.get("content").asInstanceOf[Int],
          e.get("sequence_number").asInstanceOf[Long],
          Option(df.get("equality_ids"))
            .map(_.asInstanceOf[java.util.List[Integer]].asScala.map(_.toInt).toSeq)
            .getOrElse(Nil))
      }
    }
    val dataFiles = refs.filter(_.content == 0)
    val posDeletes = refs.filter(_.content == 1)
    val eqDeletes = refs.filter(_.content == 2)

    // resolve equality ids back to column names through the published
    // schema (the external engine's path: ids are the schema's truth)
    val fieldsById = meta("schemas").asInstanceOf[JArray].arr.head
      .asInstanceOf[JObject].obj.toMap.apply("fields").asInstanceOf[JArray].arr
      .map(_.asInstanceOf[JObject].obj.toMap)
      .map(f => jlong(f("id")).toInt -> jstr(f("name"))).toMap

    // (file_path, pos) pairs per the spec's delete parquet columns
    val posPairs: Set[(String, Long)] = posDeletes.flatMap { d =>
      spark.read.parquet(Paths.get(java.net.URI.create(d.path)).toString)
        .collect().map(r => (r.getString(0), r.getLong(1)))
    }.toSet
    // pos deletes name target files explicitly; apply by (path, ordinal)
    val bigSplit = "1073741824" // one partition per (small) file → parquet row order
    val old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", bigSplit)
    try {
      dataFiles.flatMap { f =>
        val local = Paths.get(java.net.URI.create(f.path)).toString
        var rows = spark.read.parquet(local).select(cols.map(org.apache.spark.sql.functions.col): _*)
          .collect().toSeq.zipWithIndex
          .filterNot { case (_, i) => posPairs.contains((f.path, i.toLong)) }
          .map(_._1)
        eqDeletes.filter(_.seq > f.seq).foreach { d =>
          val keyCols = d.equalityIds.map(fieldsById)
          val keys: Set[Seq[Any]] =
            spark.read.parquet(Paths.get(java.net.URI.create(d.path)).toString)
              .collect().map(r => keyCols.indices.map(r.get): Seq[Any]).toSet
          val colIdx = keyCols.map(cols.indexOf)
          rows = rows.filterNot(r => keys.contains(colIdx.map(r.get).toSeq))
        }
        rows.map(_.toString)
      }.sorted
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", old)
  }

  test("export round-trips a partitioned MoR-dirty table through the Iceberg read protocol") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.ice_ns")
    spark.sql("DROP TABLE IF EXISTS lakehouse.ice_ns.t")
    spark.sql("CREATE TABLE lakehouse.ice_ns.t (k INT, v STRING, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES (" +
      "'graft.delete.mode'='merge-on-read', 'graft.merge.mode'='merge-on-read')")
    // one partition value per insert → every file provably single-tuple
    Seq("a", "b").foreach { pv =>
      (0 until 50).map(i => (i, s"$pv-$i", pv)).toDF("k", "v", "p")
        .createOrReplaceTempView("ice_src")
      spark.sql("INSERT INTO lakehouse.ice_ns.t SELECT * FROM ice_src")
    }
    // MoR dirt, both kinds: an equality delete...
    spark.sql("DELETE FROM lakehouse.ice_ns.t WHERE k >= 40 AND k < 45 AND p = 'a'")
    // ...and a positional MERGE (update rewrites row identities)
    Seq((1, "updated-1", "b"), (60, "new-60", "b"))
      .toDF("k", "v", "p").createOrReplaceTempView("ice_chg")
    spark.sql("""MERGE INTO lakehouse.ice_ns.t t USING ice_chg s
                |ON t.k = s.k AND t.p = s.p
                |WHEN MATCHED THEN UPDATE SET t.v = s.v
                |WHEN NOT MATCHED THEN INSERT (k, v, p) VALUES (s.k, s.v, s.p)
                |""".stripMargin)
    val kinds = spark.sql("SELECT kind FROM lakehouse.ice_ns.t.delete_files")
      .collect().map(_.getString(0)).toSet
    kinds shouldBe Set("equality", "positional") // genuinely dirty, both shapes

    val exported = spark.sql("CALL lakehouse.system.export_iceberg('ice_ns', 't')")
      .collect()(0).getLong(0)
    exported should be >= 4L // ≥2 data files + 2 delete files

    // the external protocol's rows == our own scan's rows
    val ours = spark.table("lakehouse.ice_ns.t")
      .select($"k", $"v", $"p").collect().map(_.toString).sorted.toSeq
    icebergRead(tableDir("t"), Seq("k", "v", "p")) shouldBe ours

    // spec-conformance pins on the metadata document
    val md = tableDir("t").resolve("metadata")
    val hint = Files.readString(md.resolve("version-hint.text")).trim.toInt
    val meta = readJson(md.resolve(s"v$hint.metadata.json"))
    Seq("format-version", "table-uuid", "location", "last-sequence-number",
      "last-updated-ms", "last-column-id", "current-schema-id", "schemas",
      "default-spec-id", "partition-specs", "last-partition-id",
      "default-sort-order-id", "sort-orders", "properties",
      "current-snapshot-id", "snapshots", "snapshot-log", "metadata-log",
      "refs").foreach(k => meta.keySet should contain(k))
    // identity partition spec over p, source-id resolved through the schema
    val specField = meta("partition-specs").asInstanceOf[JArray].arr.head
      .asInstanceOf[JObject].obj.toMap.apply("fields").asInstanceOf[JArray].arr.head
      .asInstanceOf[JObject].obj.toMap
    jstr(specField("name")) shouldBe "p"
    jstr(specField("transform")) shouldBe "identity"
    jlong(specField("field-id")) shouldBe 1000L
    // name mapping present and covering every column (our parquet has
    // no embedded field ids — this is the spec's path for such files)
    val props = meta("properties").asInstanceOf[JObject].obj.toMap
    val mapping = JsonMethods.parse(jstr(props("schema.name-mapping.default")))
      .asInstanceOf[JArray].arr.map(_.asInstanceOf[JObject].obj.toMap)
    mapping.map(f => jstr(f("names").asInstanceOf[JArray].arr.head)) shouldBe
      Seq("k", "v", "p")
    // refs name the exported snapshot as main
    jlong(meta("refs").asInstanceOf[JObject].obj.toMap.apply("main")
      .asInstanceOf[JObject].obj.toMap.apply("snapshot-id")) shouldBe
      jlong(meta("current-snapshot-id"))

    // delete manifests live under their own UNPARTITIONED spec (id 1):
    // Iceberg scopes delete application by (spec, partition tuple), so
    // a delete entry under the partitioned spec with a null tuple would
    // be applied to NOTHING by a conformant reader
    val (mfs, _) = IcebergExport.readAvro(
      Paths.get(java.net.URI.create(jstr(snap2(meta)("manifest-list")))))
    mfs.filter(_.get("content").asInstanceOf[Int] == 1).foreach { mf =>
      mf.get("partition_spec_id").asInstanceOf[Int] shouldBe 1
      val (_, mMeta) = IcebergExport.readAvro(
        Paths.get(java.net.URI.create(mf.get("manifest_path").toString)))
      mMeta("partition-spec") shouldBe "[]"
    }
    mfs.filter(_.get("content").asInstanceOf[Int] == 0).foreach { mf =>
      mf.get("partition_spec_id").asInstanceOf[Int] shouldBe 0
    }

    // column bounds: spec-serialized lower/upper (little-endian int for
    // k = field id 1, UTF-8 for p = field id 3) must match our footer
    // stats — this is what lets an external engine file-skip our data
    val (manifests2, _) = IcebergExport.readAvro(
      Paths.get(java.net.URI.create(jstr(snap2(meta)("manifest-list")))))
    val dm = manifests2.find(_.get("content").asInstanceOf[Int] == 0).get
    val (dataEntries, _) = IcebergExport.readAvro(
      Paths.get(java.net.URI.create(dm.get("manifest_path").toString)))
    val ourMeta = graft.catalog.TableMetadata.load(tableDir("t"))
    def mapOf(df: GenericRecord, field: String): Map[Int, java.nio.ByteBuffer] =
      Option(df.get(field)).map(_.asInstanceOf[java.util.List[GenericRecord]].asScala
        .map(r => r.get("key").asInstanceOf[Int] ->
          r.get("value").asInstanceOf[java.nio.ByteBuffer]).toMap).getOrElse(Map.empty)
    dataEntries.foreach { e =>
      val df = e.get("data_file").asInstanceOf[GenericRecord]
      val rel = Paths.get(java.net.URI.create(df.get("file_path").toString))
      val stats = ourMeta.fileStats(tableDir("t").relativize(rel).toString.replace('\\', '/'))
      val lower = mapOf(df, "lower_bounds"); val upper = mapOf(df, "upper_bounds")
      // k is column 1 (int, little-endian 4 bytes)
      lower(1).order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt(0) shouldBe stats("k").min.toInt
      upper(1).order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt(0) shouldBe stats("k").max.toInt
      // p is column 3 (string, UTF-8 bytes)
      def str(b: java.nio.ByteBuffer) = {
        val a = new Array[Byte](b.remaining()); b.duplicate().get(a)
        new String(a, java.nio.charset.StandardCharsets.UTF_8)
      }
      str(lower(3)) shouldBe stats("p").min
      str(upper(3)) shouldBe stats("p").max
      // null counts published where known
      val nulls = Option(df.get("null_value_counts"))
        .map(_.asInstanceOf[java.util.List[GenericRecord]].asScala
          .map(r => r.get("key").asInstanceOf[Int] -> r.get("value").asInstanceOf[Long]).toMap)
        .getOrElse(Map.empty)
      stats.get("k").flatMap(_.nulls).foreach(n => nulls(1) shouldBe n)
    }
    spark.sql("DROP TABLE lakehouse.ice_ns.t")
  }

  private def snap2(meta: Map[String, JValue]): Map[String, JValue] =
    meta("snapshots").asInstanceOf[JArray].arr
      .map(_.asInstanceOf[JObject].obj.toMap)
      .find(s => jlong(s("snapshot-id")) == jlong(meta("current-snapshot-id"))).get

  test("date-partitioned export writes avro epoch-day partition values from footer stats") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.ice_ns")
    spark.sql("DROP TABLE IF EXISTS lakehouse.ice_ns.d")
    spark.sql("CREATE TABLE lakehouse.ice_ns.d (k INT, d DATE) PARTITIONED BY (d)")
    Seq("2024-01-01", "2024-03-05").foreach { dv =>
      spark.sql(s"INSERT INTO lakehouse.ice_ns.d SELECT 1, DATE'$dv'")
    }
    spark.sql("CALL lakehouse.system.export_iceberg('ice_ns', 'd')")
    val md = tableDir("d").resolve("metadata")
    val hint = Files.readString(md.resolve("version-hint.text")).trim.toInt
    val meta = readJson(md.resolve(s"v$hint.metadata.json"))
    val snap = meta("snapshots").asInstanceOf[JArray].arr.head
      .asInstanceOf[JObject].obj.toMap
    val (manifests, _) = IcebergExport.readAvro(
      Paths.get(java.net.URI.create(jstr(snap("manifest-list")))))
    // one Avro manifest per graft chunk — aggregate across all of them
    val entries = manifests.filter(_.get("content").asInstanceOf[Int] == 0)
      .flatMap(m => IcebergExport.readAvro(
        Paths.get(java.net.URI.create(m.get("manifest_path").toString)))._1)
    // footer stats store dates as epoch-day ints; the avro partition
    // field (logicalType date) must carry them verbatim — an ISO-parse
    // of "19723" would have thrown here
    val days = entries.map(_.get("data_file").asInstanceOf[GenericRecord]
      .get("partition").asInstanceOf[GenericRecord].get("d").asInstanceOf[Int])
      .sorted
    days shouldBe Seq(
      java.time.LocalDate.parse("2024-01-01").toEpochDay.toInt,
      java.time.LocalDate.parse("2024-03-05").toEpochDay.toInt)
    spark.sql("DROP TABLE lakehouse.ice_ns.d")
  }

  test("import_iceberg round-trips the export: an INDEPENDENT consumer of the artifacts") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.ice_ns")
    spark.sql("DROP TABLE IF EXISTS lakehouse.ice_ns.rt")
    spark.sql("DROP TABLE IF EXISTS lakehouse.ice_ns.rt_imp")
    spark.sql("CREATE TABLE lakehouse.ice_ns.rt (k INT, v STRING, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES (" +
      "'graft.delete.mode'='merge-on-read', 'graft.merge.mode'='merge-on-read')")
    Seq("a", "b").foreach { pv =>
      (0 until 40).map(i => (i, s"$pv-$i", pv)).toDF("k", "v", "p")
        .createOrReplaceTempView("ice_rt_src")
      spark.sql("INSERT INTO lakehouse.ice_ns.rt SELECT * FROM ice_rt_src")
    }
    // both delete shapes, so the importer must honor both
    spark.sql("DELETE FROM lakehouse.ice_ns.rt WHERE k >= 35 AND p = 'a'")
    Seq((1, "upd-1", "b")).toDF("k", "v", "p").createOrReplaceTempView("ice_rt_chg")
    spark.sql("""MERGE INTO lakehouse.ice_ns.rt t USING ice_rt_chg s
                |ON t.k = s.k AND t.p = s.p
                |WHEN MATCHED THEN UPDATE SET t.v = s.v""".stripMargin)
    spark.sql("CALL lakehouse.system.export_iceberg('ice_ns', 'rt')")
    val md = tableDir("rt").resolve("metadata")
    val hint = Files.readString(md.resolve("version-hint.text")).trim.toInt

    // the importer consumes ONLY the Iceberg artifacts — metadata.json,
    // Avro manifests, parquet — never graft's own metadata log
    spark.sql("CALL lakehouse.system.import_iceberg('ice_ns', 'rt_imp', " +
      s"'${md.resolve(s"v$hint.metadata.json")}')")

    val schemaBack = spark.table("lakehouse.ice_ns.rt_imp").schema
    schemaBack.fieldNames.toSeq shouldBe Seq("k", "v", "p")
    val ours = spark.table("lakehouse.ice_ns.rt")
      .select($"k", $"v", $"p").collect().map(_.toString).sorted.toSeq
    val theirs = spark.table("lakehouse.ice_ns.rt_imp")
      .select($"k", $"v", $"p").collect().map(_.toString).sorted.toSeq
    theirs shouldBe ours
    // the deletes really imported AS deletes (MoR state, not baked rows)
    spark.sql("SELECT kind FROM lakehouse.ice_ns.rt_imp.delete_files")
      .collect().map(_.getString(0)).toSet shouldBe Set("equality", "positional")
    // update visible through the import's merged read
    spark.table("lakehouse.ice_ns.rt_imp")
      .where($"k" === 1 && $"p" === "b").collect()(0).getString(1) shouldBe "upd-1"
    spark.sql("DROP TABLE lakehouse.ice_ns.rt_imp")
    spark.sql("DROP TABLE lakehouse.ice_ns.rt")
  }

  test("DML after import stays exact: sequences rank-remap below the commit version") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.ice_ns")
    Seq("rt2", "rt2_imp").foreach(t => spark.sql(s"DROP TABLE IF EXISTS lakehouse.ice_ns.$t"))
    spark.sql("CREATE TABLE lakehouse.ice_ns.rt2 (k INT, v STRING, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES (" +
      "'graft.delete.mode'='merge-on-read', 'graft.merge.mode'='merge-on-read')")
    // two inserts (file seqs 2 and 3), an equality delete (seq 4), a
    // positional MERGE that also ADDS a data file at seq 5 — the source
    // sequence range [2,5] exceeds the import's commit version, the
    // exact shape that silently broke post-import DML with verbatim seqs
    Seq("a", "b").foreach { pv =>
      (0 until 10).map(i => (i, s"$pv-$i", pv)).toDF("k", "v", "p")
        .createOrReplaceTempView("ice_rt2_src")
      spark.sql("INSERT INTO lakehouse.ice_ns.rt2 SELECT * FROM ice_rt2_src")
    }
    spark.sql("DELETE FROM lakehouse.ice_ns.rt2 WHERE k >= 8 AND p = 'a'")
    Seq((1, "upd-1", "b")).toDF("k", "v", "p").createOrReplaceTempView("ice_rt2_chg")
    spark.sql("""MERGE INTO lakehouse.ice_ns.rt2 t USING ice_rt2_chg s
                |ON t.k = s.k AND t.p = s.p
                |WHEN MATCHED THEN UPDATE SET t.v = s.v""".stripMargin)
    spark.sql("CALL lakehouse.system.export_iceberg('ice_ns', 'rt2')")
    val md = tableDir("rt2").resolve("metadata")
    val hint = Files.readString(md.resolve("version-hint.text")).trim.toInt
    spark.sql("CALL lakehouse.system.import_iceberg('ice_ns', 'rt2_imp', " +
      s"'${md.resolve(s"v$hint.metadata.json")}')")

    val ours = spark.table("lakehouse.ice_ns.rt2")
      .select($"k", $"v", $"p").collect().map(_.toString).sorted.toSeq
    spark.table("lakehouse.ice_ns.rt2_imp")
      .select($"k", $"v", $"p").collect().map(_.toString).sorted.toSeq shouldBe ours

    // every imported fileSeq and delete seq sits AT OR BELOW the table
    // version (the invariant future DML at version+1 needs)
    val im = graft.catalog.TableMetadata.load(tableDir("rt2_imp"))
    im.files.map(im.seqOf).foreach(_ should be <= im.version)
    im.deleteFiles.map(_.seq).foreach(_ should be <= im.version)

    // (1) a post-import DELETE must hit EVERY imported file — including
    // the merge-added one whose source sequence (5) exceeded the import
    // version (rows resurrected under verbatim sequences)
    spark.sql("DELETE FROM lakehouse.ice_ns.rt2_imp WHERE k = 1")
    spark.table("lakehouse.ice_ns.rt2_imp").where($"k" === 1).count() shouldBe 0

    // (2) rows appended AFTER the import must not be swallowed by the
    // IMPORTED equality delete (its source seq 4 would beat the new
    // file's seq under verbatim sequences)
    Seq((8, "a-8", "a")).toDF("k", "v", "p").createOrReplaceTempView("ice_rt2_back")
    spark.sql("INSERT INTO lakehouse.ice_ns.rt2_imp SELECT * FROM ice_rt2_back")
    spark.table("lakehouse.ice_ns.rt2_imp")
      .where($"k" === 8 && $"p" === "a").count() shouldBe 1
    Seq("rt2_imp", "rt2").foreach(t => spark.sql(s"DROP TABLE lakehouse.ice_ns.$t"))
  }

  test("decimal partition column exports as an unpartitioned spec, not a failure") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.ice_ns")
    spark.sql("DROP TABLE IF EXISTS lakehouse.ice_ns.dp")
    spark.sql("CREATE TABLE lakehouse.ice_ns.dp (k INT, d DECIMAL(10,2)) PARTITIONED BY (d)")
    Seq("1.25", "7.50").foreach { dv =>
      spark.sql(s"INSERT INTO lakehouse.ice_ns.dp SELECT 1, CAST($dv AS DECIMAL(10,2))")
    }
    spark.sql("CALL lakehouse.system.export_iceberg('ice_ns', 'dp')")
      .collect()(0).getLong(0) should be >= 2L
    val md = tableDir("dp").resolve("metadata")
    val hint = Files.readString(md.resolve("version-hint.text")).trim.toInt
    val meta = readJson(md.resolve(s"v$hint.metadata.json"))
    // the Avro partition encoding has no decimal shape — the export
    // falls back to the documented unpartitioned spec instead of dying
    meta("partition-specs").asInstanceOf[JArray].arr.head
      .asInstanceOf[JObject].obj.toMap.apply("fields")
      .asInstanceOf[JArray].arr shouldBe empty
    icebergRead(tableDir("dp"), Seq("k", "d")).size shouldBe 2
    spark.sql("DROP TABLE lakehouse.ice_ns.dp")
  }

  test("import skips a truncate transform over a type our truncate doesn't support") {
    // Iceberg allows truncate[w] on decimal/binary; graft's hidden
    // truncate is string/integral only. A foreign table carrying such a
    // spec must import LOSSY-BUT-SUCCESSFUL (transform dropped, rows
    // exact) — forwarding it would make createTable throw and fail the
    // whole import of a perfectly valid table.
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.ice_ns")
    Seq("ft", "ft_imp").foreach(t => spark.sql(s"DROP TABLE IF EXISTS lakehouse.ice_ns.$t"))
    spark.sql("CREATE TABLE lakehouse.ice_ns.ft (k INT, d DECIMAL(10,2))")
    spark.sql("INSERT INTO lakehouse.ice_ns.ft SELECT 1, CAST(3.25 AS DECIMAL(10,2))")
    spark.sql("INSERT INTO lakehouse.ice_ns.ft SELECT 2, CAST(7.50 AS DECIMAL(10,2))")
    spark.sql("CALL lakehouse.system.export_iceberg('ice_ns', 'ft')")
    val md = tableDir("ft").resolve("metadata")
    val hint = Files.readString(md.resolve("version-hint.text")).trim.toInt
    val doc = md.resolve(s"v$hint.metadata.json")
    // hand-edit the document into the foreign shape: a truncate[10]
    // partition field over the decimal column (source-id 2)
    val edited = JsonMethods.parse(Files.readString(doc)) transformField {
      case ("partition-specs", JArray(spec0 :: rest)) =>
        val withField = JObject(spec0.asInstanceOf[JObject].obj.map {
          case ("fields", _) => "fields" -> (JArray(List(JObject(
            "name" -> JString("d_trunc"),
            "transform" -> JString("truncate[10]"),
            "source-id" -> JInt(2),
            "field-id" -> JInt(1000)))): JValue)
          case kv => kv
        })
        ("partition-specs", JArray(withField :: rest))
    }
    Files.writeString(doc, JsonMethods.compact(JsonMethods.render(edited)))
    spark.sql(s"CALL lakehouse.system.import_iceberg('ice_ns', 'ft_imp', '$doc')")
    val im = graft.catalog.TableMetadata.load(tableDir("ft_imp"))
    im.properties.get(graft.catalog.HiddenPartitioning.Prop) shouldBe None
    spark.table("lakehouse.ice_ns.ft_imp").collect().map(_.getInt(0)).sorted shouldBe
      Array(1, 2)
    Seq("ft_imp", "ft").foreach(t => spark.sql(s"DROP TABLE lakehouse.ice_ns.$t"))
  }

  test("a failing export leaves the previous mirror's artifacts intact") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.ice_ns")
    spark.sql("DROP TABLE IF EXISTS lakehouse.ice_ns.fz")
    spark.sql("CREATE TABLE lakehouse.ice_ns.fz (k INT)")
    Seq(1, 2).toDF("k").createOrReplaceTempView("ice_fz_src")
    spark.sql("INSERT INTO lakehouse.ice_ns.fz SELECT * FROM ice_fz_src")
    spark.sql("CALL lakehouse.system.export_iceberg('ice_ns', 'fz')")
    val md = tableDir("fz").resolve("metadata")
    val before = graft.catalog.Fs.children(md).map(_.getFileName.toString)
      .filter(n => n.endsWith(".metadata.json") ||
        (n.endsWith(".avro") && (n.startsWith("snap-") || n.startsWith("im-")))).sorted
    before should not be empty
    // VARIANT has no Iceberg v2 equivalent → the re-export throws in
    // schema translation; the working mirror must survive the attempt
    spark.sql("ALTER TABLE lakehouse.ice_ns.fz ADD COLUMN vv VARIANT")
    val err = intercept[Exception] {
      spark.sql("CALL lakehouse.system.export_iceberg('ice_ns', 'fz')").collect()
    }
    err.getMessage should include("cannot export")
    val after = graft.catalog.Fs.children(md).map(_.getFileName.toString)
      .filter(n => n.endsWith(".metadata.json") ||
        (n.endsWith(".avro") && (n.startsWith("snap-") || n.startsWith("im-")))).sorted
    after shouldBe before
    spark.sql("DROP TABLE lakehouse.ice_ns.fz")
  }

  test("hidden partitioning exports as a real Iceberg transform spec with prunable tuples") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.ice_ns")
    spark.sql("DROP TABLE IF EXISTS lakehouse.ice_ns.hpt")
    spark.sql("CREATE TABLE lakehouse.ice_ns.hpt (k INT, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts))")
    spark.sql("INSERT INTO lakehouse.ice_ns.hpt VALUES " +
      "(1, TIMESTAMP'2024-03-01 08:00:00'), (2, TIMESTAMP'2024-03-01 19:30:00'), " +
      "(3, TIMESTAMP'2024-03-02 00:15:00'), (4, TIMESTAMP'2024-03-02 23:59:59'), " +
      "(5, TIMESTAMP'2024-03-03 12:00:00')")
    spark.sql("CALL lakehouse.system.export_iceberg('ice_ns', 'hpt')")
    val md = tableDir("hpt").resolve("metadata")
    val hint = Files.readString(md.resolve("version-hint.text")).trim.toInt
    val meta = readJson(md.resolve(s"v$hint.metadata.json"))
    // the spec publishes Iceberg's own day transform, not identity —
    // external engines regain partition pruning on the hidden layout
    val specField = meta("partition-specs").asInstanceOf[JArray].arr.head
      .asInstanceOf[JObject].obj.toMap.apply("fields").asInstanceOf[JArray].arr.head
      .asInstanceOf[JObject].obj.toMap
    jstr(specField("name")) shouldBe "ts_day"
    jstr(specField("transform")) shouldBe "day"
    jlong(specField("source-id")) shouldBe 2L // ts is column 2
    // per-file tuples carry Iceberg's value domain: days from epoch
    val (manifests, _) = IcebergExport.readAvro(
      Paths.get(java.net.URI.create(jstr(snap2(meta)("manifest-list")))))
    val filesByDay: Seq[(String, Int)] = manifests
      .filter(_.get("content").asInstanceOf[Int] == 0)
      .flatMap(m => IcebergExport.readAvro(
        Paths.get(java.net.URI.create(m.get("manifest_path").toString)))._1)
      .map { e =>
        val df = e.get("data_file").asInstanceOf[GenericRecord]
        (df.get("file_path").toString,
          df.get("partition").asInstanceOf[GenericRecord].get("ts_day").asInstanceOf[Int])
      }
    filesByDay.map(_._2).toSet shouldBe Set("2024-03-01", "2024-03-02", "2024-03-03")
      .map(d => java.time.LocalDate.parse(d).toEpochDay.toInt)
    // an external engine's pruning, re-enacted: read ONLY the files
    // whose tuple matches the wanted day; result equals the filtered
    // scan — files of other days never open
    val wanted = java.time.LocalDate.parse("2024-03-02").toEpochDay.toInt
    val prunedPaths = filesByDay.filter(_._2 == wanted).map(_._1)
    prunedPaths should not be empty
    prunedPaths.size should be < filesByDay.size
    val prunedRows = prunedPaths.flatMap { p =>
      spark.read.parquet(Paths.get(java.net.URI.create(p)).toString)
        .select($"k").collect().map(_.getInt(0))
    }.sorted
    prunedRows shouldBe Seq(3, 4)
    spark.sql("DROP TABLE lakehouse.ice_ns.hpt")
  }

  test("iceberg-hash bucket layout exports as a real bucket[n] spec with prunable tuples") {
    import graft.catalog.IcebergHash
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.ice_ns")
    Seq("ibkt", "sbkt", "nbkt").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS lakehouse.ice_ns.$t"))
    spark.sql(
      """CREATE TABLE lakehouse.ice_ns.ibkt (k INT, v BIGINT)
        |PARTITIONED BY (bucket(4, k))
        |TBLPROPERTIES ('graft.bucket.hash'='iceberg')""".stripMargin)
    Seq.tabulate(200)(i => (i, i.toLong)).toDF("k", "v")
      .createOrReplaceTempView("ibkt_src")
    spark.sql("INSERT INTO lakehouse.ice_ns.ibkt SELECT * FROM ibkt_src")
    spark.sql("CALL lakehouse.system.export_iceberg('ice_ns', 'ibkt')")
    val md = tableDir("ibkt").resolve("metadata")
    val hint = Files.readString(md.resolve("version-hint.text")).trim.toInt
    val meta = readJson(md.resolve(s"v$hint.metadata.json"))
    val specField = meta("partition-specs").asInstanceOf[JArray].arr.head
      .asInstanceOf[JObject].obj.toMap.apply("fields").asInstanceOf[JArray].arr.head
      .asInstanceOf[JObject].obj.toMap
    jstr(specField("name")) shouldBe "k_bucket"
    jstr(specField("transform")) shouldBe "bucket[4]"
    jlong(specField("source-id")) shouldBe 1L // k is column 1

    // per-file tuples: each data file's rows must recompute (via the
    // published Appendix B hash) to exactly the file's claimed bucket
    val (manifests, _) = IcebergExport.readAvro(
      Paths.get(java.net.URI.create(jstr(snap2(meta)("manifest-list")))))
    val filesByBucket: Seq[(String, Int)] = manifests
      .filter(_.get("content").asInstanceOf[Int] == 0)
      .flatMap(m => IcebergExport.readAvro(
        Paths.get(java.net.URI.create(m.get("manifest_path").toString)))._1)
      .map { e =>
        val df = e.get("data_file").asInstanceOf[GenericRecord]
        (df.get("file_path").toString,
          df.get("partition").asInstanceOf[GenericRecord].get("k_bucket").asInstanceOf[Int])
      }
    filesByBucket.map(_._2).toSet shouldBe Set(0, 1, 2, 3)
    filesByBucket.foreach { case (p, b) =>
      spark.read.parquet(Paths.get(java.net.URI.create(p)).toString)
        .select($"k").as[Int].collect().foreach { k =>
          IcebergHash.bucketOf(k, org.apache.spark.sql.types.IntegerType, 4) shouldBe b
        }
    }

    // an external engine's bucket pruning, re-enacted: a point lookup
    // opens ONLY the wanted key's bucket files — 1/4 of the table
    val wantedKey = 7
    val wantedBucket =
      IcebergHash.bucketOf(wantedKey, org.apache.spark.sql.types.IntegerType, 4)
    val pruned = filesByBucket.filter(_._2 == wantedBucket).map(_._1)
    pruned should not be empty
    pruned.size should be < filesByBucket.size
    val hit = pruned.flatMap { p =>
      spark.read.parquet(Paths.get(java.net.URI.create(p)).toString)
        .filter($"k" === wantedKey).select($"v").as[Long].collect()
    }
    hit shouldBe Seq(7L)

    // a spark-hash bucketed table must NOT claim a bucket spec (its
    // murmur3(seed=42) layout is not Iceberg's hash)
    spark.sql(
      """CREATE TABLE lakehouse.ice_ns.sbkt (k INT, v BIGINT)
        |PARTITIONED BY (bucket(4, k))""".stripMargin)
    spark.sql("INSERT INTO lakehouse.ice_ns.sbkt SELECT * FROM ibkt_src")
    spark.sql("CALL lakehouse.system.export_iceberg('ice_ns', 'sbkt')")
    val smd = tableDir("sbkt").resolve("metadata")
    val shint = Files.readString(smd.resolve("version-hint.text")).trim.toInt
    val sfields = readJson(smd.resolve(s"v$shint.metadata.json"))("partition-specs")
      .asInstanceOf[JArray].arr.head
      .asInstanceOf[JObject].obj.toMap.apply("fields").asInstanceOf[JArray].arr
    sfields shouldBe empty

    // nulls in the bucket column: physically routed to bucket 0, which
    // is NOT the spec's null tuple — the export must refuse the claim
    spark.sql(
      """CREATE TABLE lakehouse.ice_ns.nbkt (k INT, v BIGINT)
        |PARTITIONED BY (bucket(4, k))
        |TBLPROPERTIES ('graft.bucket.hash'='iceberg')""".stripMargin)
    spark.sql("INSERT INTO lakehouse.ice_ns.nbkt VALUES (1, 10), (NULL, 20), (2, 30)")
    spark.sql("CALL lakehouse.system.export_iceberg('ice_ns', 'nbkt')")
    val nmd = tableDir("nbkt").resolve("metadata")
    val nhint = Files.readString(nmd.resolve("version-hint.text")).trim.toInt
    val nfields = readJson(nmd.resolve(s"v$nhint.metadata.json"))("partition-specs")
      .asInstanceOf[JArray].arr.head
      .asInstanceOf[JObject].obj.toMap.apply("fields").asInstanceOf[JArray].arr
    nfields shouldBe empty
    // but the unpartitioned export still reads exactly (rows intact)
    icebergRead(tableDir("nbkt"), Seq("k", "v")).size shouldBe 3

    Seq("ibkt", "sbkt", "nbkt").foreach(t =>
      spark.sql(s"DROP TABLE lakehouse.ice_ns.$t"))
  }

  test("bucket layout survives the round trip: import is bucket-addressable and re-exports bucket[n]") {
    import graft.catalog.{Bucketing, IcebergHash, TableMetadata}
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.ice_ns")
    Seq("rtb", "rtb_imp").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS lakehouse.ice_ns.$t"))
    spark.sql(
      """CREATE TABLE lakehouse.ice_ns.rtb (k INT, v BIGINT)
        |PARTITIONED BY (bucket(4, k))
        |TBLPROPERTIES ('graft.bucket.hash'='iceberg')""".stripMargin)
    Seq.tabulate(200)(i => (i, i.toLong)).toDF("k", "v")
      .createOrReplaceTempView("rtb_src")
    spark.sql("INSERT INTO lakehouse.ice_ns.rtb SELECT * FROM rtb_src")
    spark.sql("CALL lakehouse.system.export_iceberg('ice_ns', 'rtb')")
    val md = tableDir("rtb").resolve("metadata")
    val hint = Files.readString(md.resolve("version-hint.text")).trim.toInt
    spark.sql("CALL lakehouse.system.import_iceberg('ice_ns', 'rtb_imp', " +
      s"'${md.resolve(s"v$hint.metadata.json")}')")

    // the layout contract mapped in: same spec, same declared hash
    val impMeta = TableMetadata.load(tableDir("rtb_imp"))
    Bucketing.specOf(impMeta.properties) shouldBe Some(("k", 4))
    Bucketing.icebergHash(impMeta.properties) shouldBe true
    // every imported data file is bucket-addressable and its rows hash
    // (per the published spec) to exactly the claimed id
    impMeta.files should not be empty
    impMeta.files.foreach { f =>
      val b = Bucketing.bucketIdOf(f)
      withClue(s"$f: ") { b.isDefined shouldBe true }
      spark.read.parquet(tableDir("rtb_imp").resolve(f).toString)
        .select($"k").as[Int].collect().foreach { k =>
          IcebergHash.bucketOf(k, org.apache.spark.sql.types.IntegerType, 4) shouldBe b.get
        }
    }
    // rows intact, and a point lookup serves correctly off the pruned scan
    spark.table("lakehouse.ice_ns.rtb_imp").count() shouldBe 200
    spark.table("lakehouse.ice_ns.rtb_imp")
      .where($"k" === 123).as[(Int, Long)].collect() shouldBe Array((123, 123L))

    // storage-partitioned join with the SOURCE table: zero shuffle
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (c, _) => c -> spark.conf.getOption(c) }
    confs.foreach { case (c, v) => spark.conf.set(c, v) }
    try {
      val joined = spark.table("lakehouse.ice_ns.rtb")
        .join(spark.table("lakehouse.ice_ns.rtb_imp"), "k")
      joined.count() shouldBe 200
      val plan = joined.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.toString
        case other => other.toString
      }
      plan should not include "Exchange"
    } finally saved.foreach {
      case (c, Some(v)) => spark.conf.set(c, v)
      case (c, None) => spark.conf.unset(c)
    }

    // the re-export carries the bucket[n] spec with per-file tuples —
    // external engines keep bucket pruning across the round trip
    spark.sql("CALL lakehouse.system.export_iceberg('ice_ns', 'rtb_imp')")
    val md2 = tableDir("rtb_imp").resolve("metadata")
    val hint2 = Files.readString(md2.resolve("version-hint.text")).trim.toInt
    val meta2 = readJson(md2.resolve(s"v$hint2.metadata.json"))
    val specField2 = meta2("partition-specs").asInstanceOf[JArray].arr.head
      .asInstanceOf[JObject].obj.toMap.apply("fields").asInstanceOf[JArray].arr.head
      .asInstanceOf[JObject].obj.toMap
    jstr(specField2("transform")) shouldBe "bucket[4]"
    icebergRead(tableDir("rtb_imp"), Seq("k", "v")).size shouldBe 200

    Seq("rtb", "rtb_imp").foreach(t => spark.sql(s"DROP TABLE lakehouse.ice_ns.$t"))
  }

  test("bucketed MoR table: dirty export honestly unclaims the spec; compaction restores the round trip") {
    import graft.catalog.{Bucketing, TableMetadata}
    def specFields(t: String): List[JValue] = {
      val md = tableDir(t).resolve("metadata")
      val hint = Files.readString(md.resolve("version-hint.text")).trim.toInt
      readJson(md.resolve(s"v$hint.metadata.json"))("partition-specs")
        .asInstanceOf[JArray].arr.head
        .asInstanceOf[JObject].obj.toMap.apply("fields").asInstanceOf[JArray].arr
    }
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.ice_ns")
    Seq("rtbm", "rtbm_imp").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS lakehouse.ice_ns.$t"))
    spark.sql(
      """CREATE TABLE lakehouse.ice_ns.rtbm (k INT, v STRING)
        |PARTITIONED BY (bucket(4, k))
        |TBLPROPERTIES ('graft.bucket.hash'='iceberg',
        |  'graft.delete.mode'='merge-on-read', 'graft.merge.mode'='merge-on-read')""".stripMargin)
    Seq.tabulate(80)(i => (i, s"v-$i")).toDF("k", "v")
      .createOrReplaceTempView("rtbm_src")
    spark.sql("INSERT INTO lakehouse.ice_ns.rtbm SELECT * FROM rtbm_src")
    spark.sql("DELETE FROM lakehouse.ice_ns.rtbm WHERE k >= 70")
    Seq((1, "upd-1")).toDF("k", "v").createOrReplaceTempView("rtbm_chg")
    spark.sql("""MERGE INTO lakehouse.ice_ns.rtbm t USING rtbm_chg s
                |ON t.k = s.k WHEN MATCHED THEN UPDATE SET t.v = s.v""".stripMargin)
    // the positional MERGE's delta data file is per-task-written (not
    // bucket-addressable), so the dirty export must NOT claim bucket[4]
    // — claiming a layout the files don't have would make external
    // engines silently mis-prune
    spark.sql("CALL lakehouse.system.export_iceberg('ice_ns', 'rtbm')")
    specFields("rtbm") shouldBe empty
    // …but the full unpartitioned read stays exact, deletes and all
    icebergRead(tableDir("rtbm"), Seq("k", "v")).size shouldBe 70

    // compaction folds the deletes away and re-buckets through the one
    // layout writer — the claim returns and the round trip completes
    graft.catalog.Maintenance.compact(spark, "lakehouse", Seq("ice_ns"), "rtbm")
    spark.sql("CALL lakehouse.system.export_iceberg('ice_ns', 'rtbm')")
    specFields("rtbm") should not be empty
    val md = tableDir("rtbm").resolve("metadata")
    val hint = Files.readString(md.resolve("version-hint.text")).trim.toInt
    spark.sql("CALL lakehouse.system.import_iceberg('ice_ns', 'rtbm_imp', " +
      s"'${md.resolve(s"v$hint.metadata.json")}')")
    val impMeta = TableMetadata.load(tableDir("rtbm_imp"))
    Bucketing.specOf(impMeta.properties) shouldBe Some(("k", 4))
    impMeta.files.foreach(f =>
      withClue(s"$f: ") { Bucketing.bucketIdOf(f).isDefined shouldBe true })
    val ours = spark.table("lakehouse.ice_ns.rtbm")
      .select($"k", $"v").collect().map(_.toString).sorted.toSeq
    spark.table("lakehouse.ice_ns.rtbm_imp")
      .select($"k", $"v").collect().map(_.toString).sorted.toSeq shouldBe ours
    spark.table("lakehouse.ice_ns.rtbm_imp")
      .where($"k" === 1).collect()(0).getString(1) shouldBe "upd-1"

    // post-import DML on the imported BUCKETED table: candidates prune
    // to k=5's bucket, the rewrite uses the declared hash, and the
    // re-export STILL claims bucket[4]
    spark.sql("DELETE FROM lakehouse.ice_ns.rtbm_imp WHERE k = 5")
    spark.table("lakehouse.ice_ns.rtbm_imp").count() shouldBe 69
    spark.table("lakehouse.ice_ns.rtbm_imp").where($"k" === 5).count() shouldBe 0
    spark.sql("CALL lakehouse.system.export_iceberg('ice_ns', 'rtbm_imp')")
    specFields("rtbm_imp") should not be empty
    icebergRead(tableDir("rtbm_imp"), Seq("k", "v")).size shouldBe 69
    Seq("rtbm", "rtbm_imp").foreach(t => spark.sql(s"DROP TABLE lakehouse.ice_ns.$t"))
  }

  test("verify_buckets import re-hashes claims: honest source passes, a lying manifest refuses") {
    import graft.catalog.{Bucketing, TableMetadata}
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.ice_ns")
    Seq("vb", "vb_imp", "vb_bad").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS lakehouse.ice_ns.$t"))
    spark.sql(
      """CREATE TABLE lakehouse.ice_ns.vb (k INT, v BIGINT)
        |PARTITIONED BY (bucket(4, k))
        |TBLPROPERTIES ('graft.bucket.hash'='iceberg')""".stripMargin)
    Seq.tabulate(100)(i => (i, i.toLong)).toDF("k", "v")
      .createOrReplaceTempView("vb_src")
    spark.sql("INSERT INTO lakehouse.ice_ns.vb SELECT * FROM vb_src")
    spark.sql("CALL lakehouse.system.export_iceberg('ice_ns', 'vb')")
    val md = tableDir("vb").resolve("metadata")
    val hint = Files.readString(md.resolve("version-hint.text")).trim.toInt
    val metaPath = md.resolve(s"v$hint.metadata.json")
    spark.sql("CALL lakehouse.system.import_iceberg('ice_ns', 'vb_imp', " +
      s"'$metaPath', ref => '', verify_buckets => true)")
    Bucketing.specOf(
      TableMetadata.load(tableDir("vb_imp")).properties) shouldBe Some(("k", 4))
    spark.table("lakehouse.ice_ns.vb_imp").count() shouldBe 100

    // a LYING source: swap two data files on disk so the manifests'
    // bucket claims no longer match the bytes — the verified import
    // must refuse (a trusting import would silently mis-join forever)
    val dataFiles = Files.walk(tableDir("vb").resolve("data")).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSeq.sortBy(_.toString)
    dataFiles.size should be >= 2
    // swap the Hadoop .crc sidecars along with the bytes: a lying
    // SOURCE is internally consistent — only its manifest claims are
    // wrong. Leaving the sidecars would fail the read on a checksum
    // error instead of exercising the claim check.
    def swap(a: java.nio.file.Path, b: java.nio.file.Path): Unit = {
      val tmp = a.resolveSibling(a.getFileName.toString + ".swap")
      Files.move(a, tmp); Files.move(b, a); Files.move(tmp, b)
    }
    swap(dataFiles.head, dataFiles(1))
    def crcOf(p: java.nio.file.Path) =
      p.resolveSibling("." + p.getFileName.toString + ".crc")
    if (Files.exists(crcOf(dataFiles.head)) && Files.exists(crcOf(dataFiles(1))))
      swap(crcOf(dataFiles.head), crcOf(dataFiles(1)))
    val e = intercept[Exception] {
      spark.sql("CALL lakehouse.system.import_iceberg('ice_ns', 'vb_bad', " +
        s"'$metaPath', ref => '', verify_buckets => true)")
    }
    e.getMessage should include("bucket[4]")
    // the refusal is STATELESS: verification runs on the SOURCE files
    // before the table is created or anything links, so there is no
    // registered never-committed table to DROP by hand and no orphaned
    // b-/c- link dirs (the r16 ADVICE failure mode)
    spark.catalog.tableExists("lakehouse.ice_ns.vb_bad") shouldBe false
    Files.exists(tableDir("vb_bad")) shouldBe false
    Seq("vb", "vb_imp").foreach(t => spark.sql(s"DROP TABLE lakehouse.ice_ns.$t"))
    spark.sql("DROP TABLE IF EXISTS lakehouse.ice_ns.vb_bad")
  }

  test("tagged history survives the round trip: VERSION AS OF '<tag>' on the import") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.ice_ns")
    Seq("hist", "hist_imp").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS lakehouse.ice_ns.$t"))
    // write-through mirror from birth: each commit exports its
    // snapshot, so the metadata carries the tagged HISTORY (a one-shot
    // CALL export publishes only the current snapshot — no prior state)
    spark.sql("CREATE TABLE lakehouse.ice_ns.hist (k INT, v STRING) " +
      "TBLPROPERTIES ('graft.delete.mode'='merge-on-read', " +
      "'graft.iceberg.mirror'='true')")
    (0 until 30).map(i => (i, s"a-$i")).toDF("k", "v")
      .createOrReplaceTempView("hist_1")
    spark.sql("INSERT INTO lakehouse.ice_ns.hist SELECT * FROM hist_1") // v2
    spark.sql("CALL lakehouse.system.tag('ice_ns', 'hist', 'epoch1', 2)") // v3
    // history advances past the tag, including a MoR delete
    spark.sql("DELETE FROM lakehouse.ice_ns.hist WHERE k < 10") // v4
    (30 until 40).map(i => (i, s"b-$i")).toDF("k", "v")
      .createOrReplaceTempView("hist_2")
    spark.sql("INSERT INTO lakehouse.ice_ns.hist SELECT * FROM hist_2") // v5
    spark.sql("CALL lakehouse.system.tag('ice_ns', 'hist', 'epoch2', 5)") // v6

    val md = tableDir("hist").resolve("metadata")
    val hint = Files.readString(md.resolve("version-hint.text")).trim.toInt
    spark.sql("CALL lakehouse.system.import_iceberg('ice_ns', 'hist_imp', " +
      s"'${md.resolve(s"v$hint.metadata.json")}')")

    def rows(q: String): Seq[String] =
      spark.sql(q).collect().map(_.toString).sorted.toSeq
    // both tags time-travel on the IMPORTED table to the source's state
    rows("SELECT k, v FROM lakehouse.ice_ns.hist_imp VERSION AS OF 'epoch1'") shouldBe
      rows("SELECT k, v FROM lakehouse.ice_ns.hist VERSION AS OF 'epoch1'")
    rows("SELECT k, v FROM lakehouse.ice_ns.hist_imp VERSION AS OF 'epoch2'") shouldBe
      rows("SELECT k, v FROM lakehouse.ice_ns.hist VERSION AS OF 'epoch2'")
    // current state matches, and epoch1 kept the rows deleted later
    rows("SELECT k, v FROM lakehouse.ice_ns.hist_imp") shouldBe
      rows("SELECT k, v FROM lakehouse.ice_ns.hist")
    spark.sql("SELECT COUNT(*) FROM lakehouse.ice_ns.hist_imp VERSION AS OF 'epoch1'")
      .collect()(0).getLong(0) shouldBe 30
    spark.sql("SELECT COUNT(*) FROM lakehouse.ice_ns.hist_imp")
      .collect()(0).getLong(0) shouldBe 30 // 30 - 10 deleted + 10 appended

    // a pinned-ref import stays ONE snapshot (no history), as before
    spark.sql("DROP TABLE IF EXISTS lakehouse.ice_ns.hist_pin")
    spark.sql("CALL lakehouse.system.import_iceberg('ice_ns', 'hist_pin', " +
      s"'${md.resolve(s"v$hint.metadata.json")}', 'epoch1')")
    rows("SELECT k, v FROM lakehouse.ice_ns.hist_pin") shouldBe
      rows("SELECT k, v FROM lakehouse.ice_ns.hist VERSION AS OF 'epoch1'")
    spark.table("lakehouse.ice_ns.hist_pin.refs")
      .select("name").collect().map(_.getString(0)) should not contain "epoch1"

    // DML after a history import still applies to every imported file
    spark.sql("DELETE FROM lakehouse.ice_ns.hist_imp WHERE k >= 35")
    spark.sql("SELECT COUNT(*) FROM lakehouse.ice_ns.hist_imp")
      .collect()(0).getLong(0) shouldBe 25
    // and the tagged snapshots are untouched by the later delete
    spark.sql("SELECT COUNT(*) FROM lakehouse.ice_ns.hist_imp VERSION AS OF 'epoch2'")
      .collect()(0).getLong(0) shouldBe 30

    Seq("hist", "hist_imp", "hist_pin").foreach(t =>
      spark.sql(s"DROP TABLE lakehouse.ice_ns.$t"))
  }

  test("a real column named like a synthesized partition field never breaks the mirror") {
    // duplicate field names are illegal in the spec JSON and the Avro
    // partition record — the identity field wins, the synthesized
    // bucket field drops, and the mirror keeps working
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.ice_ns")
    spark.sql("DROP TABLE IF EXISTS lakehouse.ice_ns.coll")
    spark.sql(
      """CREATE TABLE lakehouse.ice_ns.coll (k INT, k_bucket INT)
        |PARTITIONED BY (k_bucket, bucket(4, k))
        |TBLPROPERTIES ('graft.bucket.hash'='iceberg',
        |               'graft.iceberg.mirror'='true')""".stripMargin)
    Seq((1, 10), (2, 10), (3, 20)).toDF("k", "k_bucket")
      .createOrReplaceTempView("coll_src")
    spark.sql("INSERT INTO lakehouse.ice_ns.coll SELECT * FROM coll_src")
    val md = tableDir("coll").resolve("metadata")
    val hint = Files.readString(md.resolve("version-hint.text")).trim.toInt
    val fields = readJson(md.resolve(s"v$hint.metadata.json"))("partition-specs")
      .asInstanceOf[JArray].arr.head
      .asInstanceOf[JObject].obj.toMap.apply("fields").asInstanceOf[JArray].arr
      .map(f => jstr(f.asInstanceOf[JObject].obj.toMap.apply("name")))
    fields.count(_ == "k_bucket") shouldBe 1
    icebergRead(tableDir("coll"), Seq("k", "k_bucket")).size shouldBe 3
    spark.sql("DROP TABLE lakehouse.ice_ns.coll")
  }

  test("import keeps the partition spec and sort order: filtered scans file-skip like the source") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.ice_ns")
    Seq("hps", "hps_imp").foreach(t => spark.sql(s"DROP TABLE IF EXISTS lakehouse.ice_ns.$t"))
    spark.sql("CREATE TABLE lakehouse.ice_ns.hps (ev_id BIGINT, ts TIMESTAMP, v STRING) " +
      "PARTITIONED BY (days(ts)) TBLPROPERTIES ('graft.write.sort-order'='ts')")
    val rows = (0 until 300).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2026-03-${i % 3 + 1}%02d 08:${i % 60}%02d:00"), s"v$i")
    }
    rows.toDF("ev_id", "ts", "v").createOrReplaceTempView("ice_hps_src")
    spark.sql("INSERT INTO lakehouse.ice_ns.hps SELECT * FROM ice_hps_src")
    spark.sql("CALL lakehouse.system.export_iceberg('ice_ns', 'hps')")
    val md = tableDir("hps").resolve("metadata")
    val hint = Files.readString(md.resolve("version-hint.text")).trim.toInt
    spark.sql("CALL lakehouse.system.import_iceberg('ice_ns', 'hps_imp', " +
      s"'${md.resolve(s"v$hint.metadata.json")}')")

    // the layout contract survived the round trip
    val impMeta = graft.catalog.TableMetadata.load(tableDir("hps_imp"))
    impMeta.properties.get(graft.catalog.HiddenPartitioning.Prop) shouldBe Some("days:ts")
    impMeta.properties.get(graft.catalog.WriteSortOrder.Prop) shouldBe Some("ts")

    // and it PRUNES: one day's window scans fewer files than the table
    val total = spark.sql("SELECT COUNT(*) FROM lakehouse.ice_ns.hps_imp.files")
      .collect()(0).getLong(0).toInt
    total should be >= 3
    spark.table("lakehouse.ice_ns.hps_imp")
      .filter($"ts" >= "2026-03-02 00:00:00" && $"ts" < "2026-03-03 00:00:00")
      .count() shouldBe 100
    val (survivors, all) = graft.catalog.LakehouseTable.lastScanFileCounts.get()
    all shouldBe total
    survivors should be < total
    Seq("hps_imp", "hps").foreach(t => spark.sql(s"DROP TABLE lakehouse.ice_ns.$t"))
  }

  test("write-through mirror: every commit externally readable, maintenance is O(delta)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.ice_ns")
    spark.sql("DROP TABLE IF EXISTS lakehouse.ice_ns.wm")
    spark.sql("CREATE TABLE lakehouse.ice_ns.wm (k INT, v STRING, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES (" +
      "'graft.delete.mode'='merge-on-read', 'graft.merge.mode'='merge-on-read', " +
      "'graft.iceberg.mirror'='true')")
    def check(): Unit = {
      // NO explicit CALL export_iceberg anywhere in this test: the
      // commit itself must have maintained the mirror
      val ours = spark.table("lakehouse.ice_ns.wm")
        .select($"k", $"v", $"p").collect().map(_.toString).sorted.toSeq
      icebergRead(tableDir("wm"), Seq("k", "v", "p")) shouldBe ours
    }
    // mixed commit sequence, checked after EVERY commit
    Seq("a", "b").foreach { pv =>
      (0 until 30).map(i => (i, s"$pv-$i", pv)).toDF("k", "v", "p")
        .createOrReplaceTempView("ice_wm_src")
      spark.sql("INSERT INTO lakehouse.ice_ns.wm SELECT * FROM ice_wm_src")
      check()
    }
    graft.catalog.IcebergExport.resetCounters()
    Seq((100, "c-100", "a")).toDF("k", "v", "p").createOrReplaceTempView("ice_wm_one")
    spark.sql("INSERT INTO lakehouse.ice_ns.wm SELECT * FROM ice_wm_one")
    check()
    // O(delta): the append mirrored by writing ONLY its own chunk and
    // touching no delete parquet; the two prior chunks were reused
    graft.catalog.IcebergExport.chunksWritten.get() shouldBe 1
    graft.catalog.IcebergExport.chunksReused.get() should be >= 2L
    graft.catalog.IcebergExport.deleteBytesRewritten.get() shouldBe 0L

    graft.catalog.IcebergExport.resetCounters()
    spark.sql("DELETE FROM lakehouse.ice_ns.wm WHERE k >= 25 AND p = 'a'")
    check()
    // the MoR delete rewrote exactly the new delete parquet; all data
    // chunks reused untouched
    graft.catalog.IcebergExport.chunksWritten.get() shouldBe 0
    graft.catalog.IcebergExport.deleteBytesRewritten.get() should be > 0L

    Seq((1, "upd-1", "b"), (200, "new-200", "b"))
      .toDF("k", "v", "p").createOrReplaceTempView("ice_wm_chg")
    spark.sql("""MERGE INTO lakehouse.ice_ns.wm t USING ice_wm_chg s
                |ON t.k = s.k AND t.p = s.p
                |WHEN MATCHED THEN UPDATE SET t.v = s.v
                |WHEN NOT MATCHED THEN INSERT (k, v, p) VALUES (s.k, s.v, s.p)
                |""".stripMargin)
    check()
    // compaction (rewrites data layout + drops deletes) mirrors too
    spark.sql("CALL lakehouse.system.compact('ice_ns', 'wm')")
    check()
    // property flip turns maintenance OFF: the next commit goes stale
    // (readers fail loudly on the advanced hint), proving the hook is
    // property-gated
    spark.sql("ALTER TABLE lakehouse.ice_ns.wm SET TBLPROPERTIES " +
      "('graft.iceberg.mirror'='false')")
    Seq((300, "d-300", "a")).toDF("k", "v", "p").createOrReplaceTempView("ice_wm_off")
    spark.sql("INSERT INTO lakehouse.ice_ns.wm SELECT * FROM ice_wm_off")
    val md = tableDir("wm").resolve("metadata")
    val hint = Files.readString(md.resolve("version-hint.text")).trim.toInt
    Files.exists(md.resolve(s"v$hint.metadata.json")) shouldBe false
    spark.sql("DROP TABLE lakehouse.ice_ns.wm")
  }

  test("streaming ingestion keeps the mirror fresh: external reads track every epoch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.ice_ns")
    spark.sql("DROP TABLE IF EXISTS lakehouse.ice_ns.sm")
    // the reference's actual premise: a stream writes the table, an
    // external engine reads it — with the write-through mirror the
    // epoch commits THEMSELVES maintain the external snapshot
    spark.sql("CREATE TABLE lakehouse.ice_ns.sm (k INT, v STRING) " +
      "TBLPROPERTIES ('graft.iceberg.mirror'='true')")
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Int, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("ice-sm-ckpt-").toString
    val q = in.toDF().toDF("k", "v").writeStream
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .toTable("lakehouse.ice_ns.sm")
    try {
      def check(): Unit = {
        val ours = spark.table("lakehouse.ice_ns.sm")
          .select($"k", $"v").collect().map(_.toString).sorted.toSeq
        icebergRead(tableDir("sm"), Seq("k", "v")) shouldBe ours
      }
      in.addData((1, "a"), (2, "b"))
      q.processAllAvailable()
      check()
      in.addData((3, "c"))
      q.processAllAvailable()
      check()
    } finally q.stop()
    spark.sql("DROP TABLE lakehouse.ice_ns.sm")
  }

  test("rewrite_manifests and branch fast-forward maintain the mirror before the hint moves") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.ice_ns")
    spark.sql("DROP TABLE IF EXISTS lakehouse.ice_ns.fm")
    spark.sql("CREATE TABLE lakehouse.ice_ns.fm (k INT, v STRING) " +
      "TBLPROPERTIES ('graft.iceberg.mirror'='true')")
    def check(): Unit = {
      val ours = spark.table("lakehouse.ice_ns.fm")
        .select($"k", $"v").collect().map(_.toString).sorted.toSeq
      icebergRead(tableDir("fm"), Seq("k", "v")) shouldBe ours
    }
    (0 until 2).foreach { i =>
      Seq((i, s"a-$i")).toDF("k", "v").createOrReplaceTempView("ice_fm_src")
      spark.sql("INSERT INTO lakehouse.ice_ns.fm SELECT * FROM ice_fm_src")
    }
    check()
    // metadata-only manifest consolidation is a main-log publish too —
    // the mirror must land before the hint names the new version
    spark.sql("CALL lakehouse.system.rewrite_manifests('ice_ns', 'fm')")
    check()
    // write-audit-publish: the fast-forward publishes the branch's
    // versions onto main and must bring the mirror with it
    spark.sql("CALL lakehouse.system.branch('ice_ns', 'fm', 'audit')")
    Seq((7, "b-7"), (8, "b-8")).toDF("k", "v").createOrReplaceTempView("ice_fm_br")
    spark.sql("CALL lakehouse.system.append_to_branch('ice_ns', 'fm', 'audit', 'ice_fm_br')")
    spark.sql("CALL lakehouse.system.fast_forward('ice_ns', 'fm', 'audit')")
    check() // main now holds the branch rows; external read agrees
    spark.table("lakehouse.ice_ns.fm").count() shouldBe 4
    spark.sql("DROP TABLE lakehouse.ice_ns.fm")
  }

  test("mirror failure is OBSERVABLE: the .mirror metadata table records staleness") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.ice_ns")
    spark.sql("DROP TABLE IF EXISTS lakehouse.ice_ns.ms")
    spark.sql("CREATE TABLE lakehouse.ice_ns.ms (k INT) " +
      "TBLPROPERTIES ('graft.iceberg.mirror'='true')")
    Seq(1, 2, 3).toDF("k").createOrReplaceTempView("ice_ms_src")
    spark.sql("INSERT INTO lakehouse.ice_ns.ms SELECT * FROM ice_ms_src")
    def mirrorRow(): (Boolean, Int, Int, Boolean, String) = {
      val r = spark.table("lakehouse.ice_ns.ms.mirror").collect()(0)
      (r.getBoolean(0), r.getInt(1), r.getInt(2), r.getBoolean(3),
        if (r.isNullAt(4)) null else r.getString(4))
    }
    mirrorRow() shouldBe ((true, 2, 2, false, null))

    // VARIANT has no Iceberg v2 equivalent: this COMMIT's mirror update
    // fails (never failing the commit), the hint stays behind, and the
    // failure is recorded where a reader can SEE it — not only stderr
    spark.sql("ALTER TABLE lakehouse.ice_ns.ms ADD COLUMN vv VARIANT")
    val (en, tv, hv, stale, detail) = mirrorRow()
    // the hint still advances on failure (the documented loud-stale
    // contract: readers hit a missing v3.metadata.json, not silence)
    (en, tv, hv, stale) shouldBe ((true, 3, 3, true))
    detail should include("v3")
    Files.exists(tableDir("ms").resolve("metadata")
      .resolve("v3.metadata.json")) shouldBe false
    Files.exists(tableDir("ms").resolve("metadata").resolve("mirror-stale.txt")) shouldBe true

    // the next successful commit heals: marker cleared, hint current
    spark.sql("ALTER TABLE lakehouse.ice_ns.ms DROP COLUMN vv")
    mirrorRow() shouldBe ((true, 4, 4, false, null))
    Files.exists(tableDir("ms").resolve("metadata").resolve("mirror-stale.txt")) shouldBe false
    icebergRead(tableDir("ms"), Seq("k")).size shouldBe 3
    spark.sql("DROP TABLE lakehouse.ice_ns.ms")
  }

  test("mirror lock excludes a second PROCESS: hint never names an unwritten document") {
    import scala.sys.process.{Process, ProcessLogger}
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val probe = Process(Seq("python3", "-c", "import fcntl"))
      .!(ProcessLogger(_ => (), _ => ()))
    assume(probe == 0, "python3 not available in this environment")

    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.ice_ns")
    spark.sql("DROP TABLE IF EXISTS lakehouse.ice_ns.xp")
    spark.sql("CREATE TABLE lakehouse.ice_ns.xp (k INT, v STRING) " +
      "TBLPROPERTIES ('graft.iceberg.mirror'='true')")
    val dir = tableDir("xp")
    val md = dir.resolve("metadata")
    val lockFile = md.resolve("mirror.lock")
    val release = Files.createTempDirectory("graft-xplock-").resolve("release")

    // a FOREIGN PROCESS holds the fcntl lock (java FileLock maps to the
    // same POSIX fcntl namespace on linux) until the test signals it
    val held = new java.util.concurrent.CountDownLatch(1)
    val holder = Process(Seq("python3", "-c",
      s"""
         |import fcntl, os, time
         |f = open('$lockFile', 'w')
         |fcntl.lockf(f, fcntl.LOCK_EX)
         |print('HELD', flush=True)
         |while not os.path.exists('$release'):
         |    time.sleep(0.05)
         |fcntl.lockf(f, fcntl.LOCK_UN)
         |""".stripMargin)).run(ProcessLogger(
      l => if (l.trim == "HELD") held.countDown(), _ => ()))
    try {
      assert(held.await(20, java.util.concurrent.TimeUnit.SECONDS), "holder never locked")

      // the commit publishes the graft LOG, then blocks on the foreign
      // lock for its mirror update — the iceberg hint must not move and
      // the new version's document must not exist while the lock is held
      val fut = Future {
        Seq((1, "a")).toDF("k", "v").createOrReplaceTempView("xp_src")
        spark.sql("INSERT INTO lakehouse.ice_ns.xp SELECT * FROM xp_src")
      }
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (graft.catalog.TableMetadata.currentVersion(dir) < 2 &&
             System.nanoTime() < deadline) Thread.sleep(50)
      graft.catalog.TableMetadata.currentVersion(dir) shouldBe 2
      Thread.sleep(500) // let the blocked export reach the file lock
      fut.isCompleted shouldBe false
      Files.exists(md.resolve("v2.metadata.json")) shouldBe false
      Files.readString(md.resolve("version-hint.text")).trim shouldBe "1"

      Files.createFile(release)
      Await.result(fut, 60.seconds)
      Files.exists(md.resolve("v2.metadata.json")) shouldBe true
      Files.readString(md.resolve("version-hint.text")).trim shouldBe "2"
      icebergRead(dir, Seq("k", "v")).size shouldBe 1
    } finally {
      try Files.createFile(release) catch { case _: Exception => () }
      holder.exitValue()
    }
    spark.sql("DROP TABLE lakehouse.ice_ns.xp")
  }

  test("racing commits on a mirrored table leave one readable, current mirror") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.ice_ns")
    spark.sql("DROP TABLE IF EXISTS lakehouse.ice_ns.cm")
    spark.sql("CREATE TABLE lakehouse.ice_ns.cm (k INT, v STRING) " +
      "TBLPROPERTIES ('graft.iceberg.mirror'='true')")
    // four writers race pure appends: the log serializes via slot
    // claims + rebase, and the mirror must serialize too — the striped
    // lock plus the supersession guard (an older version's mirror
    // running AFTER a newer one's must no-op, not GC its artifacts)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val tasks = (0 until 4).map { w =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          override def call(): Unit = {
            (0 until 3).foreach { i =>
              val view = s"ice_cm_w${w}_$i"
              (0 until 5).map(j => (w * 1000 + i * 10 + j, s"w$w-$i-$j"))
                .toDF("k", "v").createOrReplaceTempView(view)
              spark.sql(s"INSERT INTO lakehouse.ice_ns.cm SELECT * FROM $view")
            }
          }
        })
      }
      tasks.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    spark.table("lakehouse.ice_ns.cm").count() shouldBe 60
    // the mirror names the FINAL version and reads row-exact
    val ours = spark.table("lakehouse.ice_ns.cm")
      .select($"k", $"v").collect().map(_.toString).sorted.toSeq
    icebergRead(tableDir("cm"), Seq("k", "v")) shouldBe ours
    val md = tableDir("cm").resolve("metadata")
    val hint = Files.readString(md.resolve("version-hint.text")).trim.toInt
    hint shouldBe graft.catalog.TableMetadata.currentVersion(tableDir("cm"))
    spark.sql("DROP TABLE lakehouse.ice_ns.cm")
  }

  test("name mapping recurses into structs inside arrays, ids in lockstep with the schema") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.ice_ns")
    spark.sql("DROP TABLE IF EXISTS lakehouse.ice_ns.nest")
    spark.sql("CREATE TABLE lakehouse.ice_ns.nest " +
      "(id BIGINT, tags ARRAY<STRUCT<x: INT, y: STRING>>)")
    spark.sql("INSERT INTO lakehouse.ice_ns.nest " +
      "SELECT 1L, array(named_struct('x', 7, 'y', 'a'))")
    spark.sql("CALL lakehouse.system.export_iceberg('ice_ns', 'nest')")
    val md = tableDir("nest").resolve("metadata")
    val hint = Files.readString(md.resolve("version-hint.text")).trim.toInt
    val meta = readJson(md.resolve(s"v$hint.metadata.json"))
    val props = meta("properties").asInstanceOf[JObject].obj.toMap
    val mapping = JsonMethods.parse(jstr(props("schema.name-mapping.default")))
      .asInstanceOf[JArray].arr.map(_.asInstanceOf[JObject].obj.toMap)
    def fid(m: Map[String, JValue]) = jlong(m("field-id")).toInt
    def kids(m: Map[String, JValue]) = m("fields").asInstanceOf[JArray].arr
      .map(_.asInstanceOf[JObject].obj.toMap)
    fid(mapping(0)) shouldBe 1 // id
    fid(mapping(1)) shouldBe 2 // tags
    val elem = kids(mapping(1)).head
    fid(elem) shouldBe 3 // element
    // the struct INSIDE the array maps too — x=4, y=5, matching the
    // schema's depth-first allocation (readers without embedded parquet
    // ids resolve these leaves only through the mapping)
    kids(elem).map(fid) shouldBe List(4, 5)
    kids(elem).map(f => jstr(f("names").asInstanceOf[JArray].arr.head)) shouldBe
      List("x", "y")
    // ids agree with the published schema's own allocation
    val tagsField = meta("schemas").asInstanceOf[JArray].arr.head
      .asInstanceOf[JObject].obj.toMap.apply("fields").asInstanceOf[JArray].arr
      .map(_.asInstanceOf[JObject].obj.toMap).find(f => jstr(f("name")) == "tags").get
    val listType = tagsField("type").asInstanceOf[JObject].obj.toMap
    jlong(listType("element-id")).toInt shouldBe 3
    spark.sql("DROP TABLE lakehouse.ice_ns.nest")
  }

  test("re-export retains live snapshots, GCs expired ones; hint always names a live export") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.ice_ns")
    spark.sql("DROP TABLE IF EXISTS lakehouse.ice_ns.g")
    spark.sql("CREATE TABLE lakehouse.ice_ns.g (k INT)")
    Seq(1, 2, 3).toDF("k").createOrReplaceTempView("ice_gsrc")
    spark.sql("INSERT INTO lakehouse.ice_ns.g SELECT * FROM ice_gsrc")
    spark.sql("CALL lakehouse.system.export_iceberg('ice_ns', 'g')")
    spark.sql("INSERT INTO lakehouse.ice_ns.g SELECT * FROM ice_gsrc")
    spark.sql("CALL lakehouse.system.export_iceberg('ice_ns', 'g')")
    val md = tableDir("g").resolve("metadata")
    def names() = graft.catalog.Fs.children(md).map(_.getFileName.toString)
    val exports = names().filter(_.endsWith(".metadata.json"))
    // BOTH documents retained: a reader that loaded the hint just
    // before the re-export still resolves its version's document
    exports.size shouldBe 2
    val hint = Files.readString(md.resolve("version-hint.text")).trim.toInt
    exports should contain(s"v$hint.metadata.json")
    // the previous snapshot's manifest list is RETAINED (its graft
    // version is still live → external time travel can reach it), and
    // the snapshots array lists both
    names().count(n => n.startsWith("snap-") && n.endsWith(".avro")) shouldBe 2
    val meta = readJson(md.resolve(s"v$hint.metadata.json"))
    meta("snapshots").asInstanceOf[JArray].arr.size shouldBe 2
    // unpartitioned table → empty spec, still schema-valid
    meta("partition-specs").asInstanceOf[JArray].arr.head
      .asInstanceOf[JObject].obj.toMap.apply("fields")
      .asInstanceOf[JArray].arr shouldBe empty
    // expiring graft's history retires the exported snapshot too: the
    // mirror follows the SAME retention the table itself enforces
    spark.sql("CALL lakehouse.system.expire_snapshots('ice_ns', 'g', 1)")
    spark.sql("CALL lakehouse.system.export_iceberg('ice_ns', 'g')")
    names().count(n => n.startsWith("snap-") && n.endsWith(".avro")) shouldBe 1
    names().count(_.endsWith(".metadata.json")) shouldBe 1 // expired doc GC'd
    readJson(md.resolve(s"v$hint.metadata.json"))("snapshots")
      .asInstanceOf[JArray].arr.size shouldBe 1
    spark.sql("DROP TABLE lakehouse.ice_ns.g")
  }
  test("ANALYZE statistics round-trip: exported Puffin NDV imports as CBO properties") {
    import graft.catalog.{TableMetadata, TableStats}
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.ice_ns")
    Seq("st", "st_imp").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS lakehouse.ice_ns.$t"))
    spark.sql("CREATE TABLE lakehouse.ice_ns.st (k INT, v STRING)")
    Seq.tabulate(60)(i => (i % 20, s"s${i % 7}")).toDF("k", "v")
      .createOrReplaceTempView("st_src")
    spark.sql("INSERT INTO lakehouse.ice_ns.st SELECT * FROM st_src")
    spark.sql("CALL lakehouse.system.analyze('ice_ns', 'st')")
    spark.sql("CALL lakehouse.system.export_iceberg('ice_ns', 'st')")
    val md = tableDir("st").resolve("metadata")
    val hint = Files.readString(md.resolve("version-hint.text")).trim.toInt
    val metaDoc = org.json4s.jackson.JsonMethods.parse(
      Files.readString(md.resolve(s"v$hint.metadata.json")))
      .asInstanceOf[org.json4s.JObject].obj.toMap
    // the document advertises a statistics entry whose Puffin file the
    // independent python reader also validates (q123 gate); here the
    // SCALA reader parses it back and the import must round-trip it
    val statsArr = metaDoc("statistics").asInstanceOf[org.json4s.JArray].arr
    statsArr should not be empty
    val statsPath = java.nio.file.Paths.get(java.net.URI.create(
      statsArr.head.asInstanceOf[org.json4s.JObject].obj.toMap
        .apply("statistics-path").asInstanceOf[org.json4s.JString].s))
    val blobs = IcebergExport.readPuffinBlobs(statsPath)
    blobs.map(_._1).distinct shouldBe Seq("graft-ndv-v1")
    blobs should have size 2 // k and v both analyzable

    spark.sql("CALL lakehouse.system.import_iceberg('ice_ns', 'st_imp', " +
      s"'${md.resolve(s"v$hint.metadata.json")}')")
    val src = TableMetadata.load(tableDir("st")).properties
    val imp = TableMetadata.load(tableDir("st_imp")).properties
    // the full encoded stat (ndv:nulls[:avgLen:maxLen]) survives — the
    // imported table plans under CBO with the source's measurements
    imp(TableStats.colProp("k")) shouldBe src(TableStats.colProp("k"))
    imp(TableStats.colProp("v")) shouldBe src(TableStats.colProp("v"))
    imp(TableStats.colProp("k")).split(':').head shouldBe "20"
    imp(TableStats.NumRowsProp) shouldBe "60"
    // the source's staleness marker survives the trip
    imp should contain key "graft.stats.import.sourceVersion"
    // row counts agree through the import's own footer sums
    spark.table("lakehouse.ice_ns.st_imp").count() shouldBe 60

    // a MoR-dirty snapshot must NOT import stats: raw file row sums
    // overcount its live rows, and CBO would trust the lie
    spark.sql("DROP TABLE IF EXISTS lakehouse.ice_ns.st_mor")
    spark.sql("DROP TABLE IF EXISTS lakehouse.ice_ns.st_mor_imp")
    spark.sql("CREATE TABLE lakehouse.ice_ns.st_mor (k INT) " +
      "TBLPROPERTIES ('graft.delete.mode'='merge-on-read')")
    spark.sql("INSERT INTO lakehouse.ice_ns.st_mor SELECT * FROM range(40)")
    spark.sql("DELETE FROM lakehouse.ice_ns.st_mor WHERE k % 2 = 0")
    spark.sql("CALL lakehouse.system.analyze('ice_ns', 'st_mor')")
    spark.sql("CALL lakehouse.system.export_iceberg('ice_ns', 'st_mor')")
    val md2 = tableDir("st_mor").resolve("metadata")
    val h2 = Files.readString(md2.resolve("version-hint.text")).trim.toInt
    spark.sql("CALL lakehouse.system.import_iceberg('ice_ns', 'st_mor_imp', " +
      s"'${md2.resolve(s"v$h2.metadata.json")}')")
    val impMor = TableMetadata.load(tableDir("st_mor_imp")).properties
    impMor.keySet.exists(_.startsWith("graft.stats.")) shouldBe false
    spark.table("lakehouse.ice_ns.st_mor_imp").count() shouldBe 20
    Seq("st", "st_imp", "st_mor", "st_mor_imp").foreach(t =>
      spark.sql(s"DROP TABLE lakehouse.ice_ns.$t"))
  }
}
