package graft.catalog

import java.nio.file.{Files, Path}
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Iceberg-compatible metadata EXPORT — the reference's multi-engine
  * premise (`/root/reference/README.md:567-570`: Spark writes the
  * table, BigQuery reads the same files through mirrored metadata;
  * `iceberg_table_creation.py:63-74` wires the mirror as
  * TBLPROPERTIES). Our metadata log is engine-private JSON; this
  * writes a SPEC-CONFORMANT Apache Iceberg v2 snapshot of the current
  * version — `metadata/v<N>.metadata.json`, an Avro manifest list, Avro
  * manifests, and rewritten v2 delete files — so any Iceberg reader
  * (DuckDB's `iceberg_scan`, Trino, Spark+Iceberg, BigQuery/BigLake)
  * can read the table's CURRENT snapshot directly from storage, no
  * graft code involved.
  *
  * Discovery follows Iceberg's HadoopCatalog convention, which our own
  * log already satisfies by construction: `metadata/version-hint.text`
  * holds the current version N (shared — both formats number versions
  * identically), and the export lands at `metadata/v<N>.metadata.json`
  * next to our `v<N>.json`. The names cannot collide, and none of our
  * maintenance listings match the export's names (`v\d+\.json`,
  * `m-*.json`, `*.reap` patterns all miss `*.metadata.json` /
  * `*.avro`). An export is a point-in-time MIRROR: after further graft
  * commits the hint advances past it and external readers fail loudly
  * on the missing `v<N+1>.metadata.json` until the next export — the
  * same refresh obligation the reference's BigQuery mirror carries.
  * Each export garbage-collects the previous one's artifacts.
  *
  * Correspondence choices, each pinned by IcebergExportSpec:
  *  - data/delete file paths are absolute `file:` URIs; data files are
  *    our existing parquet, untouched. They carry no parquet field
  *    IDs, so the metadata publishes `schema.name-mapping.default`
  *    (the spec's path for imported files — Iceberg's own
  *    `add_files` relies on it).
  *  - sequence numbers are our commit versions: `fileSeq` for data
  *    files, entry `seq` for deletes. Apply semantics then agree
  *    engine-to-engine: Iceberg applies position deletes to data
  *    sequence ≤ delete sequence and equality deletes strictly less;
  *    our reader applies entries iff `entry.seq > fileSeq(f)`, and no
  *    graft writer emits a positional entry targeting a file of its
  *    own commit, so ≤ vs < is indistinguishable on exported tables.
  *  - positional delete parquets are REWRITTEN (our `(file, pos)`
  *    table-relative pairs → spec columns `file_path` (2147483546) /
  *    `pos` (2147483545) with absolute URIs, sorted, parquet field
  *    IDs written); equality delete parquets are rewritten with the
  *    key columns' assigned field IDs and published `equality_ids`.
  *  - the partition spec exports as identity transforms over
  *    `partitionColumns` when every data file provably holds exactly
  *    one partition tuple (footer min == max, zero nulls, short string
  *    bounds); otherwise the export declares an unpartitioned spec —
  *    honest (hash-clustered writes can mix values in a file) and
  *    still spec-conformant, costing external engines only partition
  *    pruning. DELETE files always export under an UNPARTITIONED spec
  *    (id 1 on partitioned tables): Iceberg scopes delete application
  *    by (spec, partition tuple) and our delete entries are
  *    table-global — unpartitioned-spec deletes are exactly that.
  *
  * Scale: the export is metadata-proportional — O(files) manifest
  * entries plus a distributed rewrite of delete parquets. Data files
  * are never copied.
  */
object IcebergExport {

  /** Iceberg position-delete column IDs (Iceberg spec, Appendix —
    * reserved field IDs). */
  val PosPathFieldId = 2147483546L.toInt
  val PosPosFieldId = 2147483545L.toInt

  // ---- schema translation ---------------------------------------------------

  /** One table column translated to Iceberg: (assigned field ids are
    * depth-first, 1-based, matching Iceberg's fresh-schema assignment). */
  private final case class IdAlloc(var next: Int) { def take(): Int = { val v = next; next += 1; v } }

  /** Iceberg type JSON for a Spark type. Assigns nested ids from
    * `alloc` in the spec's order (struct fields first, then their
    * nested types, depth-first per field). */
  private def icebergType(dt: DataType, alloc: IdAlloc): JValue = dt match {
    case BooleanType => JString("boolean")
    case ByteType | ShortType | IntegerType => JString("int")
    case LongType => JString("long")
    case FloatType => JString("float")
    case DoubleType => JString("double")
    case StringType => JString("string")
    case BinaryType => JString("binary")
    case DateType => JString("date")
    case TimestampType => JString("timestamptz")
    case TimestampNTZType => JString("timestamp")
    case d: DecimalType => JString(s"decimal(${d.precision}, ${d.scale})")
    case ArrayType(et, containsNull) =>
      val eid = alloc.take()
      JObject(
        "type" -> JString("list"),
        "element-id" -> JInt(eid),
        "element" -> icebergType(et, alloc),
        "element-required" -> JBool(!containsNull))
    case MapType(kt, vt, valueContainsNull) =>
      val kid = alloc.take(); val vid = alloc.take()
      JObject(
        "type" -> JString("map"),
        "key-id" -> JInt(kid),
        "key" -> icebergType(kt, alloc),
        "value-id" -> JInt(vid),
        "value" -> icebergType(vt, alloc),
        "value-required" -> JBool(!valueContainsNull))
    case st: StructType =>
      JObject(
        "type" -> JString("struct"),
        "fields" -> JArray(st.fields.map { f =>
          val fid = alloc.take()
          JObject(
            "id" -> JInt(fid),
            "name" -> JString(f.name),
            "required" -> JBool(!f.nullable),
            "type" -> icebergType(f.dataType, alloc))
        }.toList))
    case other =>
      throw new IllegalArgumentException(
        s"cannot export column type ${other.sql} to Iceberg (no spec equivalent)")
  }

  /** Top-level field name → assigned id (needed for equality_ids and
    * partition source-ids). Mirrors [[icebergType]]'s allocation order:
    * each top-level field takes the next id, then its nested types. */
  private[catalog] def topLevelIds(schema: StructType): Map[String, Int] = {
    val alloc = IdAlloc(1)
    schema.fields.map { f =>
      val fid = alloc.take()
      icebergType(f.dataType, alloc) // advance past nested ids
      f.name -> fid
    }.toMap
  }

  /** Full Iceberg schema JSON (schema-id 0) + the last allocated id. */
  private def schemaJson(schema: StructType): (JValue, Int) = {
    val alloc = IdAlloc(1)
    val struct = icebergType(schema, alloc)
    val withId = struct.asInstanceOf[JObject] ~ ("schema-id" -> JInt(0))
    (withId, alloc.next - 1)
  }

  private implicit class JObjOps(o: JObject) {
    def ~(kv: (String, JValue)): JObject = JObject(o.obj :+ kv)
  }

  /** `schema.name-mapping.default`: our parquet data files carry no
    * field IDs, so readers resolve columns by name through this
    * mapping (recursive for nested types, per the spec's
    * name-mapping serialization). */
  private def nameMapping(schema: StructType): JValue = {
    val alloc = IdAlloc(1)
    // fully recursive — every nested level maps, including structs
    // inside arrays/maps — with id allocation in LOCKSTEP with
    // icebergType's depth-first order (map key/value ids allocate
    // consecutively BEFORE either side's nested types, same as there)
    def node(fid: Int, name: String, dt: DataType): JObject = {
      val base = JObject(
        "field-id" -> JInt(fid),
        "names" -> JArray(List(JString(name))))
      children(dt) match {
        case Nil => base
        case kids => base ~ ("fields" -> (JArray(kids.map(x => x: JValue)): JValue))
      }
    }
    def children(dt: DataType): List[JObject] = dt match {
      case st: StructType => st.fields.toList.map { f =>
        val fid = alloc.take(); node(fid, f.name, f.dataType)
      }
      case ArrayType(et, _) =>
        val eid = alloc.take(); List(node(eid, "element", et))
      case MapType(kt, vt, _) =>
        val kid = alloc.take(); val vid = alloc.take()
        List(node(kid, "key", kt), node(vid, "value", vt))
      case _ => Nil
    }
    JArray(children(schema).map(x => x: JValue))
  }

  // ---- avro schemas ---------------------------------------------------------

  /** Avro field JSON with Iceberg's `field-id` prop. */
  private def af(name: String, typ: String, fieldId: Int, optional: Boolean): String = {
    val t = if (optional) s"""["null", $typ]""" else typ
    val dflt = if (optional) ""","default": null""" else ""
    s"""{"name": "$name", "type": $t, "field-id": $fieldId$dflt}"""
  }

  /** manifest_file — the manifest-list entry schema (Iceberg spec v2). */
  private val manifestListSchema: Schema = new Schema.Parser().parse(
    s"""{"type": "record", "name": "manifest_file", "fields": [
       |${af("manifest_path", "\"string\"", 500, optional = false)},
       |${af("manifest_length", "\"long\"", 501, optional = false)},
       |${af("partition_spec_id", "\"int\"", 502, optional = false)},
       |${af("content", "\"int\"", 517, optional = false)},
       |${af("sequence_number", "\"long\"", 515, optional = false)},
       |${af("min_sequence_number", "\"long\"", 516, optional = false)},
       |${af("added_snapshot_id", "\"long\"", 503, optional = false)},
       |${af("added_files_count", "\"int\"", 504, optional = false)},
       |${af("existing_files_count", "\"int\"", 505, optional = false)},
       |${af("deleted_files_count", "\"int\"", 506, optional = false)},
       |${af("added_rows_count", "\"long\"", 512, optional = false)},
       |${af("existing_rows_count", "\"long\"", 513, optional = false)},
       |${af("deleted_rows_count", "\"long\"", 514, optional = false)},
       |{"name": "partitions", "type": ["null", {"type": "array", "element-id": 508,
       |  "items": {"type": "record", "name": "r508", "fields": [
       |    ${af("contains_null", "\"boolean\"", 509, optional = false)},
       |    ${af("contains_nan", "\"boolean\"", 518, optional = true)},
       |    ${af("lower_bound", "\"bytes\"", 510, optional = true)},
       |    ${af("upper_bound", "\"bytes\"", 511, optional = true)}]}}],
       | "field-id": 507, "default": null},
       |${af("key_metadata", "\"bytes\"", 519, optional = true)}
       |]}""".stripMargin)

  /** Avro type for a partition column (identity transform ⇒ the source
    * column's primitive type). */
  private def avroPrimitive(dt: DataType): String = dt match {
    case BooleanType => "\"boolean\""
    case ByteType | ShortType | IntegerType => "\"int\""
    case LongType => "\"long\""
    case FloatType => "\"float\""
    case DoubleType => "\"double\""
    case StringType => "\"string\""
    case DateType => """{"type": "int", "logicalType": "date"}"""
    case TimestampType | TimestampNTZType =>
      """{"type": "long", "logicalType": "timestamp-micros", "adjust-to-utc": true}"""
    case other =>
      throw new IllegalArgumentException(
        s"unsupported identity-partition type for export: ${other.sql}")
  }

  /** Iceberg's Avro encoding of `map<int, X>`: an array-of-records with
    * logicalType map (int keys cannot use Avro's native string-keyed
    * map). `kId`/`vId` are the spec's key/value field ids. */
  private def intMap(name: String, fieldId: Int, kId: Int, vId: Int, vType: String): String =
    s"""{"name": "$name", "field-id": $fieldId, "default": null, "type":
       |  ["null", {"type": "array", "logicalType": "map",
       |    "items": {"type": "record", "name": "k${kId}_v$vId", "fields": [
       |      {"name": "key", "type": "int", "field-id": $kId},
       |      {"name": "value", "type": $vType, "field-id": $vId}]}}]}""".stripMargin

  /** manifest_entry with the given partition struct (field ids 1000+). */
  private def manifestEntrySchema(partFields: Seq[(String, DataType, Int)]): Schema = {
    val partJson = partFields.map { case (n, dt, fid) =>
      s"""{"name": "$n", "type": ["null", ${avroPrimitive(dt)}], "field-id": $fid, "default": null}"""
    }.mkString(",\n")
    new Schema.Parser().parse(
      s"""{"type": "record", "name": "manifest_entry", "fields": [
         |${af("status", "\"int\"", 0, optional = false)},
         |${af("snapshot_id", "\"long\"", 1, optional = true)},
         |${af("sequence_number", "\"long\"", 3, optional = true)},
         |${af("file_sequence_number", "\"long\"", 4, optional = true)},
         |{"name": "data_file", "field-id": 2, "type":
         |  {"type": "record", "name": "r2", "fields": [
         |    ${af("content", "\"int\"", 134, optional = false)},
         |    ${af("file_path", "\"string\"", 100, optional = false)},
         |    ${af("file_format", "\"string\"", 101, optional = false)},
         |    {"name": "partition", "field-id": 102, "type":
         |      {"type": "record", "name": "r102", "fields": [$partJson]}},
         |    ${af("record_count", "\"long\"", 103, optional = false)},
         |    ${af("file_size_in_bytes", "\"long\"", 104, optional = false)},
         |    ${intMap("null_value_counts", 110, 121, 122, "\"long\"")},
         |    ${intMap("lower_bounds", 125, 126, 127, "\"bytes\"")},
         |    ${intMap("upper_bounds", 128, 129, 130, "\"bytes\"")},
         |    {"name": "equality_ids", "field-id": 135, "default": null, "type":
         |      ["null", {"type": "array", "items": "int", "element-id": 136}]},
         |    ${af("sort_order_id", "\"int\"", 140, optional = true)}
         |  ]}}
         |]}""".stripMargin)
  }

  /** Iceberg single-value binary serialization (spec Appendix D) for
    * the bound maps: little-endian numerics, UTF-8 strings. The input
    * is [[FooterStats]]' rendered string (numerics as decimal text,
    * dates already epoch-day, timestamps already micros). None for
    * types the spec table doesn't cover here or unparsable values —
    * the column's bound is simply omitted (bounds are optional). */
  private[catalog] def boundBytes(dt: DataType, s: String): Option[java.nio.ByteBuffer] = {
    def le(n: Int) = java.nio.ByteBuffer.allocate(n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    try dt match {
      case ByteType | ShortType | IntegerType | DateType =>
        Some(le(4).putInt(s.toInt).flip().asInstanceOf[java.nio.ByteBuffer])
      case LongType | TimestampType | TimestampNTZType =>
        Some(le(8).putLong(s.toLong).flip().asInstanceOf[java.nio.ByteBuffer])
      case FloatType =>
        Some(le(4).putFloat(s.toFloat).flip().asInstanceOf[java.nio.ByteBuffer])
      case DoubleType =>
        Some(le(8).putDouble(s.toDouble).flip().asInstanceOf[java.nio.ByteBuffer])
      case BooleanType =>
        Some(java.nio.ByteBuffer.wrap(Array[Byte](if (s.toBoolean) 1 else 0)))
      case StringType =>
        Some(java.nio.ByteBuffer.wrap(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      case _ => None
    } catch { case _: NumberFormatException | _: IllegalArgumentException => None }
  }

  private def writeAvro(
      target: Path, schema: Schema,
      meta: Seq[(String, String)], records: Seq[GenericRecord]): Long = {
    val writer = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    meta.foreach { case (k, v) => writer.setMeta(k, v) }
    writer.create(schema, target.toFile)
    try records.foreach(writer.append) finally writer.close()
    Files.size(target)
  }

  /** Read every record of an exported Avro file (test/verification
    * surface — also used by IcebergExportSpec to replay the read
    * protocol from the artifacts alone). */
  private[graft] def readAvro(path: Path): (Seq[GenericRecord], Map[String, String]) = {
    val reader = new DataFileReader[GenericRecord](
      path.toFile, new GenericDatumReader[GenericRecord]())
    try {
      val recs = Iterator.continually(reader)
        .takeWhile(_.hasNext).map(_.next()).toVector
      val metaKeys = reader.getMetaKeys.asScala.toSeq
      (recs, metaKeys.map(k => k -> Option(reader.getMetaString(k)).getOrElse("")).toMap)
    } finally reader.close()
  }

  // ---- export ---------------------------------------------------------------

  /** Export the current snapshot. Returns the number of files (data +
    * delete) the external snapshot references. */
  def export(
      spark: SparkSession,
      catalog: String,
      namespace: Seq[String],
      table: String): Long = {
    val dir = Maintenance.lakehouseTable(spark, catalog, namespace, table).tableDir
    val meta = TableMetadata.load(dir)
    val md = TableMetadata.metadataDir(dir)
    val snapshotId = meta.version.toLong
    val nowMs = System.currentTimeMillis()

    // the previous export's artifacts are recorded NOW and garbage-
    // collected only AFTER the new metadata.json is atomically in place:
    // a mid-export failure (unsupported column type, IO error during the
    // delete rewrite) must leave the last working mirror untouched. New
    // artifact names are UUID-unique, so nothing collides meanwhile.
    val expDel = dir.resolve("deletes-iceberg")
    def artifacts(): Seq[Path] =
      (Fs.children(md).iterator.filter { p =>
        val n = p.getFileName.toString
        n.endsWith(".metadata.json") || (n.startsWith("snap-") && n.endsWith(".avro")) ||
          (n.startsWith("im-") && n.endsWith(".avro"))
      } ++ (if (Files.isDirectory(expDel)) Fs.children(expDel).iterator
            else Iterator.empty)).toSeq
    def drop(p: Path): Unit =
      try { if (Files.isDirectory(p)) Fs.deleteRecursively(p) else Files.deleteIfExists(p) }
      catch { case _: Exception => () }
    val staleArtifacts = artifacts()
    val target = md.resolve(s"v${meta.version}.metadata.json")
    val fileCount = try {

    val (schemaJ, lastColumnId) = schemaJson(meta.schema)
    val ids = topLevelIds(meta.schema)
    def uri(rel: String): String = dir.resolve(rel).toUri.toString

    // identity partition spec iff every data file provably holds ONE
    // partition tuple: footer min == max AND zero nulls (a null-bearing
    // column means two tuples per file) on every partition column.
    // Strings additionally require short bounds — writers may truncate
    // long binary stats, and truncation-equal bounds do not prove a
    // single value (the same caution FileSkipping's exact proofs take).
    val partCols = meta.partitionColumns
    // the partition tuple's Avro encoding covers primitives only
    // ([[avroPrimitive]]): a decimal/binary/nested partition column
    // falls back to the unpartitioned spec instead of failing the
    // whole export
    def avroEncodable(dt: DataType): Boolean = dt match {
      case BooleanType | ByteType | ShortType | IntegerType | LongType |
           FloatType | DoubleType | StringType | DateType |
           TimestampType | TimestampNTZType => true
      case _ => false
    }
    def singleValued(c: String, r: ColumnRange): Boolean =
      r.hasValues && r.min == r.max && r.nulls.contains(0L) &&
        (meta.schema.fields.find(_.name == c).map(_.dataType) match {
          case Some(StringType) => r.min.length < 32
          case _ => true
        })
    val partitioned = partCols.nonEmpty &&
      partCols.forall(c => meta.schema.fields.find(_.name == c)
        .exists(f => avroEncodable(f.dataType))) &&
      meta.files.forall { f =>
        partCols.forall { c =>
          meta.fileStats.get(f).flatMap(_.get(c)).exists(singleValued(c, _)) ||
            meta.fileRows.get(f).contains(0L)
        }
      }
    val specFields: Seq[(String, DataType, Int)] =
      if (!partitioned) Seq.empty
      else partCols.zipWithIndex.map { case (c, i) =>
        (c, meta.schema(c).dataType, 1000 + i)
      }
    val entrySchema = manifestEntrySchema(specFields)
    val partSchema = entrySchema.getField("data_file").schema()
      .getField("partition").schema()
    val dataFileSchema = entrySchema.getField("data_file").schema()
    // DELETE files export under their own UNPARTITIONED spec (id 1 when
    // the table spec has fields): Iceberg scopes delete files by
    // (spec, partition tuple) — a delete entry written under the
    // partitioned spec with a null tuple would be scoped to the null
    // partition and conformant readers would apply it to NOTHING. Our
    // delete entries are table-global, which is exactly what an
    // unpartitioned-spec delete means.
    val delSpecId = if (partitioned) 1 else 0
    val delEntrySchema =
      if (partitioned) manifestEntrySchema(Seq.empty) else entrySchema
    val emptyDelPart = new GenericData.Record(
      delEntrySchema.getField("data_file").schema().getField("partition").schema())

    def partRecord(stats: Map[String, ColumnRange]): GenericRecord = {
      val r = new GenericData.Record(partSchema)
      specFields.foreach { case (c, dt, _) =>
        val v: AnyRef = stats.get(c).map(_.min) match {
          case None => null
          case Some(s) => dt match {
            case ByteType | ShortType | IntegerType => Int.box(s.toInt)
            case LongType => Long.box(s.toLong)
            case FloatType => Float.box(s.toFloat)
            case DoubleType => Double.box(s.toDouble)
            case BooleanType => Boolean.box(s.toBoolean)
            case StringType => s
            // FooterStats renders parquet's physical values verbatim:
            // dates are already epoch-day ints, timestamps micros —
            // exactly the avro date / timestamp-micros encodings
            case DateType => Int.box(s.toInt)
            case TimestampType | TimestampNTZType => Long.box(s.toLong)
            case other => throw new IllegalArgumentException(other.sql)
          }
        }
        r.put(c, v)
      }
      r
    }

    // array-of-record element schemas for the int-keyed maps
    def intMapVal(dfs: Schema, field: String, kvs: Seq[(Int, AnyRef)]): AnyRef =
      if (kvs.isEmpty) null
      else {
        val arrSchema = dfs.getField(field).schema().getTypes.get(1)
        val arr = new GenericData.Array[GenericRecord](kvs.size, arrSchema)
        kvs.sortBy(_._1).foreach { case (k, v) =>
          val r = new GenericData.Record(arrSchema.getElementType)
          r.put("key", Int.box(k)); r.put("value", v); arr.add(r)
        }
        arr
      }

    def entry(
        filePath: String, content: Int, seq: Long, rows: Long, bytes: Long,
        part: GenericRecord, equalityIds: Seq[Int],
        stats: Map[String, ColumnRange] = Map.empty,
        es: Schema = entrySchema): GenericRecord = {
      val dfs = es.getField("data_file").schema()
      val df = new GenericData.Record(dfs)
      df.put("content", Int.box(content))
      df.put("file_path", filePath)
      df.put("file_format", "PARQUET")
      df.put("partition", part)
      df.put("record_count", Long.box(rows))
      df.put("file_size_in_bytes", Long.box(bytes))
      // per-column pruning stats (optional maps, omitted where unknown):
      // null counts + spec-serialized lower/upper bounds keyed by field
      // id — this is what lets an EXTERNAL engine file-skip our data
      val byId = stats.toSeq.flatMap { case (c, r) =>
        for {
          id <- ids.get(c)
          f <- meta.schema.fields.find(_.name == c)
        } yield (id, f.dataType, r)
      }
      df.put("null_value_counts", intMapVal(dfs, "null_value_counts",
        byId.flatMap { case (id, _, r) => r.nulls.map(n => id -> (Long.box(n): AnyRef)) }))
      df.put("lower_bounds", intMapVal(dfs, "lower_bounds",
        byId.flatMap { case (id, dt, r) =>
          if (!r.hasValues) None else boundBytes(dt, r.min).map(id -> (_: AnyRef)) }))
      df.put("upper_bounds", intMapVal(dfs, "upper_bounds",
        byId.flatMap { case (id, dt, r) =>
          if (!r.hasValues) None else boundBytes(dt, r.max).map(id -> (_: AnyRef)) }))
      df.put("equality_ids",
        if (equalityIds.isEmpty) null
        else new GenericData.Array[Integer](
          dfs.getField("equality_ids").schema().getTypes.get(1),
          equalityIds.map(Int.box).asJava))
      df.put("sort_order_id", null)
      val e = new GenericData.Record(es)
      e.put("status", Int.box(1)) // ADDED in this (exported) snapshot
      e.put("snapshot_id", Long.box(snapshotId))
      e.put("sequence_number", Long.box(seq))
      e.put("file_sequence_number", Long.box(seq))
      e.put("data_file", df)
      e
    }

    val emptyPart = new GenericData.Record(partSchema)
    specFields.foreach { case (c, _, _) => emptyPart.put(c, null) }

    // ---- data manifest
    val dataEntries = meta.files.map { f =>
      val stats = meta.fileStats.getOrElse(f, Map.empty)
      val part = if (partitioned) partRecord(stats) else emptyPart
      entry(uri(f), content = 0, seq = meta.seqOf(f).toLong,
        rows = meta.fileRows.getOrElse(f, sparkCount(spark, dir, f)),
        bytes = Files.size(dir.resolve(f)), part, Nil, stats)
    }

    // ---- delete files: rewrite into spec shapes with field IDs
    Files.createDirectories(expDel)
    def withFieldIds(st: StructType, idOf: String => Int): StructType =
      StructType(st.fields.map { f =>
        f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
          .putLong("parquet.field.id", idOf(f.name).toLong).build())
      })
    val deleteEntries = SessionConf.withConf(spark,
      "spark.sql.parquet.fieldId.write.enabled", "true") { meta.deleteFiles.map { d =>
      // the entry's own parquet holds the full (possibly consolidated)
      // tuple set; components may already be vacuumed
      val src = spark.read.parquet(dir.resolve(d.path).toString)
      if (d.isPositional) {
        val rel = s"deletes-iceberg/pos-${UUID.randomUUID().toString.take(12)}.parquet"
        val prefix = dir.toUri.toString
        val rewritten = src
          .select(
            org.apache.spark.sql.functions.concat(
              org.apache.spark.sql.functions.lit(prefix),
              col(DeleteFile.PosFileCol)).as("file_path"),
            col(DeleteFile.PosPosCol).cast(LongType).as("pos"))
          .orderBy(col("file_path"), col("pos"))
        writeSingleParquet(spark, rewritten, withFieldIds(
          StructType(Seq(
            StructField("file_path", StringType, nullable = false),
            StructField("pos", LongType, nullable = false))),
          Map("file_path" -> PosPathFieldId, "pos" -> PosPosFieldId)), dir, rel)
        entry(uri(rel), content = 1, seq = d.seq.toLong, rows = d.rows,
          bytes = Files.size(dir.resolve(rel)), emptyDelPart, Nil,
          es = delEntrySchema)
      } else {
        val rel = s"deletes-iceberg/eq-${UUID.randomUUID().toString.take(12)}.parquet"
        val keyIds = d.keyColumns.map(ids(_))
        val keySchema = StructType(d.keyColumns.map(c => meta.schema(c)))
        writeSingleParquet(spark, src.select(d.keyColumns.map(col): _*),
          withFieldIds(keySchema, ids), dir, rel)
        entry(uri(rel), content = 2, seq = d.seq.toLong, rows = d.rows,
          bytes = Files.size(dir.resolve(rel)), emptyDelPart, keyIds,
          es = delEntrySchema)
      }
    } }

    // ---- manifests + manifest list
    val specJson = JsonMethods.compact(JsonMethods.render(JArray(
      specFields.map { case (c, _, fid) =>
        JObject(
          "name" -> JString(c),
          "transform" -> JString("identity"),
          "source-id" -> JInt(ids(c)),
          "field-id" -> JInt(fid)): JValue
      }.toList)))
    val schemaStr = JsonMethods.compact(JsonMethods.render(schemaJ))
    def manifestMeta(content: String, spec: String, specId: Int) = Seq(
      "schema" -> schemaStr,
      "schema-id" -> "0",
      "partition-spec" -> spec,
      "partition-spec-id" -> specId.toString,
      "format-version" -> "2",
      "content" -> content)

    def manifestFor(
        name: String, content: Int, entries: Seq[GenericRecord]): Option[GenericRecord] = {
      if (entries.isEmpty) return None
      val rel = s"metadata/im-$name-${UUID.randomUUID().toString.take(12)}.avro"
      val (es, spec, specId) =
        if (content == 0) (entrySchema, specJson, 0)
        else (delEntrySchema, if (partitioned) "[]" else specJson, delSpecId)
      val len = writeAvro(dir.resolve(rel), es,
        manifestMeta(if (content == 0) "data" else "deletes", spec, specId), entries)
      val seqs = entries.map(_.get("sequence_number").asInstanceOf[Long])
      val rows = entries.map(_.get("data_file").asInstanceOf[GenericRecord]
        .get("record_count").asInstanceOf[Long]).sum
      val m = new GenericData.Record(manifestListSchema)
      m.put("manifest_path", uri(rel))
      m.put("manifest_length", Long.box(len))
      m.put("partition_spec_id", Int.box(specId))
      m.put("content", Int.box(content))
      m.put("sequence_number", Long.box(seqs.max))
      m.put("min_sequence_number", Long.box(seqs.min))
      m.put("added_snapshot_id", Long.box(snapshotId))
      m.put("added_files_count", Int.box(entries.size))
      m.put("existing_files_count", Int.box(0))
      m.put("deleted_files_count", Int.box(0))
      m.put("added_rows_count", Long.box(rows))
      m.put("existing_rows_count", Long.box(0L))
      m.put("deleted_rows_count", Long.box(0L))
      m.put("partitions", null)
      m.put("key_metadata", null)
      Some(m)
    }
    val manifests =
      manifestFor("data", 0, dataEntries).toSeq ++
        manifestFor("del", 1, deleteEntries).toSeq
    val listRel = s"metadata/snap-$snapshotId-${UUID.randomUUID().toString.take(12)}.avro"
    writeAvro(dir.resolve(listRel), manifestListSchema,
      Seq(
        "snapshot-id" -> snapshotId.toString,
        "sequence-number" -> meta.version.toString,
        "format-version" -> "2"),
      manifests)

    // ---- metadata.json
    val tableUuid = UUID.nameUUIDFromBytes(
      ("graft-iceberg:" + dir.toAbsolutePath.normalize.toString)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)).toString
    val userProps = meta.properties.filterNot(_._1.startsWith("graft."))
    val metadataJson = JObject(
      "format-version" -> JInt(2),
      "table-uuid" -> JString(tableUuid),
      "location" -> JString(dir.toUri.toString.stripSuffix("/")),
      "last-sequence-number" -> JInt(meta.version),
      "last-updated-ms" -> JLong(nowMs),
      "last-column-id" -> JInt(lastColumnId),
      "current-schema-id" -> JInt(0),
      "schemas" -> JArray(List(schemaJ)),
      "default-spec-id" -> JInt(0),
      "partition-specs" -> JArray(
        List(JObject(
          "spec-id" -> JInt(0),
          "fields" -> JsonMethods.parse(specJson))) ++
          (if (partitioned) List(JObject(
            "spec-id" -> (JInt(1): JValue),
            "fields" -> (JArray(Nil): JValue)): JValue) else Nil)),
      "last-partition-id" -> JInt(if (specFields.isEmpty) 999 else specFields.map(_._3).max),
      "default-sort-order-id" -> JInt(0),
      "sort-orders" -> JArray(List(JObject(
        "order-id" -> JInt(0), "fields" -> JArray(Nil)))),
      "properties" -> JObject(
        (userProps + ("schema.name-mapping.default" ->
          JsonMethods.compact(JsonMethods.render(nameMapping(meta.schema)))))
          .toList.sortBy(_._1).map { case (k, v) => k -> (JString(v): JValue) }),
      "current-snapshot-id" -> JLong(snapshotId),
      "snapshots" -> JArray(List(JObject(
        "snapshot-id" -> JLong(snapshotId),
        "sequence-number" -> JInt(meta.version),
        "timestamp-ms" -> JLong(nowMs),
        "manifest-list" -> JString(uri(listRel)),
        "summary" -> JObject(
          "operation" -> JString("append"),
          "total-records" -> JString(
            meta.files.map(f => meta.fileRows.getOrElse(f, 0L)).sum.toString),
          "total-data-files" -> JString(meta.files.size.toString)),
        "schema-id" -> JInt(0)))),
      "snapshot-log" -> JArray(List(JObject(
        "timestamp-ms" -> JLong(nowMs), "snapshot-id" -> JLong(snapshotId)))),
      "metadata-log" -> JArray(Nil),
      "refs" -> JObject("main" -> JObject(
        "snapshot-id" -> JLong(snapshotId),
        "type" -> JString("branch"))))
    val tmp = Files.createTempFile(md, ".icemeta-", ".tmp")
    try {
      Files.writeString(tmp, JsonMethods.pretty(JsonMethods.render(metadataJson)))
      Files.move(tmp, target,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } finally Files.deleteIfExists(tmp)
    (dataEntries.size + deleteEntries.size).toLong

    } catch {
      case e: Throwable =>
        // a failed attempt rolls back ITS artifacts only (everything
        // matching the export patterns that predates this call stays —
        // the last working mirror survives a mid-export throw)
        val stale = staleArtifacts.toSet
        artifacts().filterNot(p => stale(p) || p == target).foreach(drop)
        throw e
    }
    // the new export is live — NOW retire the previous one's artifacts.
    // A same-version re-export already swapped metadata.json in place
    // via REPLACE_EXISTING, so the target itself is never dropped.
    staleArtifacts.filterNot(_ == target).foreach(drop)
    fileCount
  }

  /** Row count fallback for files missing from fileRows (pre-rows-era
    * metadata): parquet footer count via a metadata-only read. */
  private def sparkCount(spark: SparkSession, dir: Path, rel: String): Long =
    spark.read.parquet(dir.resolve(rel).toString).count()

  /** Write `df` as EXACTLY ONE parquet file at `rel` (delete files are
    * single spec objects, not directories). Coalesce(1) is safe: delete
    * parquets are O(changed rows), never corpus-sized. */
  private def writeSingleParquet(
      spark: SparkSession,
      df: org.apache.spark.sql.DataFrame,
      schema: StructType,
      dir: Path, rel: String): Unit = {
    val tmp = dir.resolve(rel + ".tmpdir")
    // carry the parquet.field.id metadata through a plain select — the
    // writer reads it off the schema when fieldId.write is enabled
    val projected = df.select(schema.fields.map(f =>
      col(f.name).cast(f.dataType).as(f.name, f.metadata)).toSeq: _*)
    projected.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Fs.children(tmp).find(_.getFileName.toString.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException(s"no parquet written under $tmp"))
    Files.createDirectories(dir.resolve(rel).getParent)
    Files.move(part, dir.resolve(rel))
    Fs.deleteRecursively(tmp)
  }
}
