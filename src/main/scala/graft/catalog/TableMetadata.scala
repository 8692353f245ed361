package graft.catalog

import java.nio.file.{Files, Path, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.types.{DataType, StructType}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** One committed snapshot of a lakehouse table.
  *
  * Mirrors the observable surface of the reference's Iceberg metadata
  * layer (metadata JSON log + snapshot history the notebook queries via
  * `tbl.metadata_log_entries`, reference
  * `jupyterlab_notebooks/demo_jupyterlab_blms_dataproc_pyspark.ipynb`
  * cell 11; REST `metadata_location`, `README.md:543-551`) without the
  * Iceberg wire format: each commit writes an immutable `vN.json`, and
  * the current version is the highest N present.
  */
final case class Snapshot(
    version: Int,
    timestampMs: Long,
    operation: String,
    addedFiles: Int,
    totalFiles: Int)

/** A merge-on-read delete file (Iceberg v2's two delete shapes):
  *
  *  - `kind = "equality"`: a small parquet of KEY TUPLES whose matching
  *    rows are removed at read time from every data file committed
  *    before it (the shape Flink CDC upserts write — rewriting a 1 GB
  *    data file per deleted row is untenable at 100 TB). `keyColumns`
  *    name table columns; `keyRanges` (footer min/max of the key
  *    columns) lets the read path prove most data files CLEAN and
  *    stream them join-free.
  *  - `kind = "positional"`: a parquet of (file, pos) pairs — the
  *    table-relative data file path and the 0-based row offset within
  *    it (the shape a row-level MERGE/DELETE produces cheaply for
  *    non-key-addressable rows). `keyColumns` is `Seq("file", "pos")`;
  *    `keyRanges("file")` holds the min/max TARGETED PATH so untargeted
  *    files skip the anti-join entirely.
  *
  * `seq` is the commit version that added the entry: it applies to a
  * data file f iff `seq > fileSeq(f)`, so rows (re)inserted AFTER the
  * delete are untouched (for positional entries this is exact too: the
  * offsets were scanned from files of the snapshot the entry was
  * computed against). */
final case class DeleteFile(
    path: String,
    keyColumns: Seq[String],
    seq: Int,
    rows: Long,
    keyRanges: Map[String, ColumnRange] = Map.empty,
    kind: String = DeleteFile.Equality) {
  def isPositional: Boolean = kind == DeleteFile.Positional
}

object DeleteFile {
  val Equality = "equality"
  val Positional = "positional"

  /** Key-column names of a positional entry's parquet (mirrored by
    * [[MergeOnRead.PosFileCol]]/[[MergeOnRead.PosPosCol]]). */
  val PosFileCol = "file"
  val PosPosCol = "pos"
}

/** Full table metadata: schema, properties, file list, snapshot log. */
final case class TableMetadata(
    version: Int,
    name: String,
    schema: StructType,
    partitionColumns: Seq[String],
    properties: Map[String, String],
    files: Seq[String],
    snapshots: Seq[Snapshot],
    fileStats: Map[String, Map[String, ColumnRange]] = Map.empty,
    fileRows: Map[String, Long] = Map.empty,
    fileSeq: Map[String, Int] = Map.empty,
    deleteFiles: Seq[DeleteFile] = Seq.empty) {

  /** Commit version that added data file `f`. Missing entries (metadata
    * written before sequence tracking) default to 0 = "before every
    * delete", which over-applies deletes only to files that genuinely
    * predate them — conservative-correct. */
  def seqOf(f: String): Int = fileSeq.getOrElse(f, 0)

  def toJson: String = {
    def rangeJson(r: ColumnRange): JValue = {
      val base =
        if (r.hasValues)
          List("min" -> (JString(r.min): JValue), "max" -> (JString(r.max): JValue))
        else List("allNull" -> (JBool(true): JValue))
      JObject(base ++ r.nulls.map(n => "nulls" -> (JLong(n): JValue)).toList)
    }
    val j = JObject(
      "version" -> JInt(version),
      "name" -> JString(name),
      "schema" -> JsonMethods.parse(schema.json),
      "partitionColumns" -> JArray(partitionColumns.map(JString(_)).toList),
      "properties" -> JObject(properties.toList.sortBy(_._1).map { case (k, v) => k -> JString(v) }),
      "files" -> JArray(files.map(JString(_)).toList),
      "fileStats" -> JObject(fileStats.toList.sortBy(_._1).map { case (f, cols) =>
        f -> (JObject(cols.toList.sortBy(_._1).map { case (c, r) =>
          c -> rangeJson(r)
        }): JValue)
      }),
      "fileRows" -> JObject(fileRows.toList.sortBy(_._1).map { case (f, n) =>
        f -> (JLong(n): JValue)
      }),
      "fileSeq" -> JObject(fileSeq.toList.sortBy(_._1).map { case (f, v) =>
        f -> (JInt(v): JValue)
      }),
      "deleteFiles" -> JArray(deleteFiles.map { d =>
        JObject(
          "path" -> JString(d.path),
          "keyColumns" -> JArray(d.keyColumns.map(JString(_)).toList),
          "seq" -> JInt(d.seq),
          "rows" -> JLong(d.rows),
          "kind" -> JString(d.kind),
          "keyRanges" -> JObject(d.keyRanges.toList.sortBy(_._1).map { case (c, r) =>
            c -> rangeJson(r)
          }))
      }.toList),
      "snapshots" -> JArray(snapshots.map { s =>
        JObject(
          "version" -> JInt(s.version),
          "timestampMs" -> JLong(s.timestampMs),
          "operation" -> JString(s.operation),
          "addedFiles" -> JInt(s.addedFiles),
          "totalFiles" -> JInt(s.totalFiles))
      }.toList))
    JsonMethods.pretty(JsonMethods.render(j))
  }
}

object TableMetadata {

  def fromJson(text: String): TableMetadata = {
    val j = JsonMethods.parse(text)
    def str(v: JValue): String = v match { case JString(s) => s; case other => other.values.toString }
    def int(v: JValue): Int = v match {
      case JInt(i) => i.toInt; case JLong(l) => l.toInt; case other => other.values.toString.toInt
    }
    def long(v: JValue): Long = v match {
      case JInt(i) => i.toLong; case JLong(l) => l; case other => other.values.toString.toLong
    }
    val o = j.asInstanceOf[JObject].obj.toMap
    def parseRange(r: JValue): ColumnRange = {
      val ro = r.asInstanceOf[JObject].obj.toMap
      if (ro.contains("min"))
        ColumnRange(str(ro("min")), str(ro("max")), ro.get("nulls").map(long))
      else ColumnRange("", "", ro.get("nulls").map(long), hasValues = false)
    }
    TableMetadata(
      version = int(o("version")),
      name = str(o("name")),
      schema = DataType.fromJson(JsonMethods.compact(o("schema"))).asInstanceOf[StructType],
      partitionColumns = o("partitionColumns").asInstanceOf[JArray].arr.map(str),
      properties = o("properties").asInstanceOf[JObject].obj.map { case (k, v) => k -> str(v) }.toMap,
      files = o("files").asInstanceOf[JArray].arr.map(str),
      fileStats = o.get("fileStats").collect { case fs: JObject =>
        fs.obj.map { case (f, cols) =>
          f -> cols.asInstanceOf[JObject].obj.map { case (c, r) =>
            c -> parseRange(r)
          }.toMap
        }.toMap
      }.getOrElse(Map.empty),
      fileRows = o.get("fileRows").collect { case fr: JObject =>
        fr.obj.map { case (f, n) => f -> long(n) }.toMap
      }.getOrElse(Map.empty),
      fileSeq = o.get("fileSeq").collect { case fs: JObject =>
        fs.obj.map { case (f, v) => f -> int(v) }.toMap
      }.getOrElse(Map.empty),
      deleteFiles = o.get("deleteFiles").collect { case JArray(ds) =>
        ds.map { dv =>
          val d = dv.asInstanceOf[JObject].obj.toMap
          DeleteFile(
            path = str(d("path")),
            keyColumns = d("keyColumns").asInstanceOf[JArray].arr.map(str),
            seq = int(d("seq")),
            rows = long(d("rows")),
            keyRanges = d.get("keyRanges").collect { case kr: JObject =>
              kr.obj.map { case (c, r) => c -> parseRange(r) }.toMap
            }.getOrElse(Map.empty),
            // absent in pre-positional metadata → equality (back-compat)
            kind = d.get("kind").map(str).getOrElse(DeleteFile.Equality))
        }
      }.getOrElse(Seq.empty),
      snapshots = o("snapshots").asInstanceOf[JArray].arr.map { sv =>
        val so = sv.asInstanceOf[JObject].obj.toMap
        Snapshot(int(so("version")), long(so("timestampMs")), str(so("operation")),
          int(so("addedFiles")), int(so("totalFiles")))
      })
  }

  def metadataDir(tableDir: Path): Path = tableDir.resolve("metadata")

  def versionFile(tableDir: Path, v: Int): Path = metadataDir(tableDir).resolve(s"v$v.json")

  /** Highest committed version, or 0 if none (not a table). */
  def currentVersion(tableDir: Path): Int = {
    val md = metadataDir(tableDir)
    if (!Files.isDirectory(md)) return 0
    Fs.children(md).iterator
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("v") && s.endsWith(".json") =>
        s.stripPrefix("v").stripSuffix(".json").toIntOption.getOrElse(0)
      }
      .foldLeft(0)(math.max)
  }

  def exists(tableDir: Path): Boolean = currentVersion(tableDir) > 0

  def load(tableDir: Path): TableMetadata = {
    val v = currentVersion(tableDir)
    require(v > 0, s"not a lakehouse table: $tableDir")
    fromJson(Files.readString(versionFile(tableDir, v)))
  }

  /** Load every RETAINED metadata version in order (the metadata log).
    * Versions removed by `Maintenance.expireSnapshots` leave gaps;
    * callers that need a contiguous window (incremental reads) must
    * check completeness by version number, not position. */
  def loadLog(tableDir: Path): Seq[TableMetadata] =
    (1 to currentVersion(tableDir)).flatMap { v =>
      // read-then-catch, not exists-then-read: a concurrent
      // expireSnapshots between the two would crash the reader instead
      // of registering as a gap
      try Some(fromJson(Files.readString(versionFile(tableDir, v))))
      catch { case _: java.nio.file.NoSuchFileException => None }
    }

  /** Optimistic-concurrency commit: write to a temp file, then publish
    * as `v{meta.version}.json` with an operation that FAILS if the
    * target already exists. `Files.move(ATOMIC_MOVE)` is rename(2) on
    * Linux, which silently replaces an existing target — two racing
    * committers would both "succeed". `Files.createLink` maps to
    * link(2), which atomically fails with EEXIST, so exactly one racer
    * wins and the loser gets a clear conflict error — the snapshot
    * isolation story the reference inherits from Iceberg's metadata
    * swap (`README.md:543-551`). Falls back to move-after-exists-check
    * only on filesystems without hard links.
    */
  /** Publishes `meta` as the next version. Returns the metadata as
    * actually written — i.e. with the structural fileSeq assignments
    * filled in — so callers that keep reasoning about the committed
    * snapshot (rebase tests, applicability checks) see the same seqs a
    * reader loading it from disk would. */
  def commit(tableDir: Path, meta: TableMetadata): TableMetadata = {
    val md = metadataDir(tableDir)
    Files.createDirectories(md)
    val target = versionFile(tableDir, meta.version)
    if (Files.exists(target))
      throw new IllegalStateException(
        s"commit conflict: version ${meta.version} already exists for ${meta.name}")
    // Structural fileSeq maintenance — done HERE so no commit site can
    // forget it (a missed site would silently re-apply old equality
    // deletes to new data): every data file keeps the seq it already
    // had in the predecessor version; files appearing for the first
    // time get this commit's version. An entry the caller supplied
    // explicitly wins (rollback restores historical seqs this way).
    val prevSeq =
      if (meta.version <= 1) Map.empty[String, Int]
      else {
        val pf = versionFile(tableDir, meta.version - 1)
        try fromJson(Files.readString(pf)).fileSeq
        catch { case _: java.nio.file.NoSuchFileException => Map.empty[String, Int] }
      }
    val sequenced = meta.copy(fileSeq = meta.files.map { f =>
      f -> meta.fileSeq.getOrElse(f, prevSeq.getOrElse(f, meta.version))
    }.toMap)
    val tmp = Files.createTempFile(md, s".v${meta.version}-", ".json.tmp")
    Files.writeString(tmp, sequenced.toJson)
    try {
      try Files.createLink(target, tmp)
      catch {
        case _: UnsupportedOperationException | _: java.nio.file.FileSystemException
            if !Files.exists(target) =>
          // no hard-link support (and not a genuine conflict): best effort
          Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
      }
    } catch {
      case e @ (_: java.nio.file.FileAlreadyExistsException | _: java.nio.file.FileSystemException)
          if Files.exists(target) =>
        throw new IllegalStateException(
          s"commit conflict: version ${meta.version} already exists for ${meta.name}", e)
    } finally Files.deleteIfExists(tmp)
    sequenced
  }

  /** [[commit]] with optimistic rebase — the Iceberg commit loop,
    * generalized to every commit kind. `attempt` was computed against
    * `base`; when another writer published versions in between, the
    * commit's DELTA (files and delete entries added/removed, property
    * changes, its snapshot entry) is re-derived and re-applied onto the
    * winner's metadata IF the two changes commute, retrying up to
    * `maxAttempts`. Data files were already written exactly once by the
    * caller — only the cheap metadata fold repeats. Non-commutable
    * overlaps fail with the conflict error: correctness over
    * availability.
    *
    * Commutability rules (conservative):
    *  - pure appends commute with everything — two racing ingest jobs
    *    both land, serialized;
    *  - property-only changes commute with everything (per-key
    *    last-writer-wins; keys the attempt removed stay removed);
    *  - new equality-delete entries (MoR delete) commute with appends
    *    and property changes; entry seqs are PRESERVED, so a rebased
    *    delete still applies exactly to the data files of the snapshot
    *    it was computed from and never to rows a racer appended
    *    concurrently — snapshot isolation, Iceberg's default;
    *  - UPSERT-shaped commits (new delete entries + new data files, no
    *    removals) also commute, but their entries are RE-SEQUENCED to
    *    the rebased commit version: the upsert contract is key
    *    uniqueness, so the delete must cover concurrently-appended
    *    rows too (Iceberg's commit-time sequence assignment);
    *  - rewrites (remove+add: compact, COW DML, materialize, rollback)
    *    commute only with appends/property changes: a racing rewrite of
    *    overlapping state is a lost update, and racing delete entries
    *    may target the very files being rewritten (their rows would
    *    resurrect in the rewritten output);
    *  - schema or partition-spec changes on either side are never
    *    auto-rebased.
    *
    * Returns the metadata actually committed (== `attempt` when no race
    * happened). */
  def commitOrRebase(
      tableDir: Path,
      attempt: TableMetadata,
      base: TableMetadata,
      maxAttempts: Int = 10): TableMetadata = {
    var b = base
    var att = attempt
    var tries = 0
    while (true) {
      try {
        return commit(tableDir, att)
      } catch {
        case e: IllegalStateException if e.getMessage.contains("commit conflict") =>
          tries += 1
          if (tries > maxAttempts) throw e
          val cur = load(tableDir)
          att = rebase(b, att, cur).getOrElse(throw new IllegalStateException(
            s"commit conflict: ${att.name} changed concurrently (v${b.version} -> " +
              s"v${cur.version}) and the changes do not commute; re-run against the " +
              "current snapshot", e))
          b = cur
      }
    }
    att // unreachable
  }

  /** Re-derive base→attempt as a delta and apply it to `cur`, or None
    * when the concurrent base→cur change does not commute with it.
    * `private[catalog]`: branch-log commits (Maintenance) run the same
    * rebase loop against the branch head. */
  private[catalog] def rebase(
      base: TableMetadata,
      attempt: TableMetadata,
      cur: TableMetadata): Option[TableMetadata] = {
    val baseFiles = base.files.toSet
    val curFiles = cur.files.toSet
    val added = attempt.files.filterNot(baseFiles)
    val removed = baseFiles -- attempt.files.toSet
    val baseDels = base.deleteFiles.toSet
    val addedDels = attempt.deleteFiles.filterNot(baseDels)
    val removedDels = baseDels -- attempt.deleteFiles.toSet
    val racerRemovedFiles = (baseFiles -- curFiles).nonEmpty
    val racerAddedDels = cur.deleteFiles.exists(!baseDels.contains(_))
    val racerRemovedDels = (baseDels -- cur.deleteFiles.toSet).nonEmpty
    val racerRewrote = racerRemovedFiles || racerRemovedDels

    val schemaStable = attempt.schema == base.schema && cur.schema == base.schema &&
      attempt.partitionColumns == base.partitionColumns &&
      cur.partitionColumns == base.partitionColumns
    if (!schemaStable) return None
    // A CHECK constraint or generation expression the racer added (or
    // tightened) since `base` has never seen the attempt's rows — its
    // declaration-time verification scanned only the files committed
    // before it. Rebasing a file-adding commit over it would land
    // unverified rows and the constraint together (the race the INSERT
    // commit loop defends by re-verifying its written files; every
    // commitOrRebase site — add_files import, MoR DML, streaming
    // epochs, COW rewrites — gets the decline instead: the commit
    // fails clean and the caller re-runs against the snapshot that
    // carries the new constraint). Property keys the attempt itself
    // changed are already arbitrated by the property-merge rules.
    if (added.nonEmpty) {
      val racerAddedChecks = cur.properties.exists { case (k, v) =>
        (k.startsWith(CheckConstraints.Prefix) || k.startsWith(GeneratedColumns.Prefix)) &&
          !base.properties.get(k).contains(v)
      }
      if (racerAddedChecks) return None
    }
    val isRewrite = removed.nonEmpty || removedDels.nonEmpty
    if (isRewrite && (racerRewrote || racerAddedDels)) return None
    if (addedDels.nonEmpty && racerRewrote) {
      // Equality entries target by VALUE: a racer rewrite may have
      // copied matching rows into fresh files the preserved-seq entry
      // will not cover (resurrection) — never commute. Positional
      // entries name their targets EXACTLY: when every racer-removed
      // file is provably outside every entry's targeted path range,
      // the two changes are disjoint and commute; overlap (or an
      // entry without a provable range) refuses — row offsets into a
      // rewritten file are meaningless.
      val racerGone = baseFiles -- curFiles
      val provablyDisjoint = addedDels.forall { d =>
        d.isPositional && (d.keyRanges.get(DeleteFile.PosFileCol) match {
          case Some(r) if r.hasValues =>
            !racerGone.exists(f => r.min <= f && f <= r.max)
          case _ => false
        })
      }
      if (!provablyDisjoint) return None
    }

    val next = cur.version + 1
    val addedSet = added.toSet
    val propRemoved = base.properties.keySet -- attempt.properties.keySet
    val propChanged = attempt.properties.filter { case (k, v) =>
      !base.properties.get(k).contains(v)
    }
    val newFiles = cur.files.filterNot(removed) ++ added.filterNot(curFiles)
    // Upsert-shaped attempts (new data files AND new delete entries, no
    // removals) get their delete entries RE-SEQUENCED to the rebased
    // commit version. The upsert contract is key uniqueness: its delete
    // must also cover rows a racer appended concurrently, else two
    // racing upserts of one key both land with neither delete covering
    // the other's file (each preserved seq <= the racer's file seq) and
    // the key ends up duplicated. Iceberg assigns sequence numbers at
    // commit time for exactly this reason. The attempt's own files take
    // seq = next structurally in commit(), and applicability is strict
    // (seq > fileSeq), so the re-sequenced entry never deletes the
    // upsert's own rows. Plain deletes (no appended files) keep their
    // seq — snapshot isolation: never delete concurrently-appended rows.
    val isUpsertShaped = added.nonEmpty && addedDels.nonEmpty && !isRewrite
    val rebasedDels =
      if (isUpsertShaped) addedDels.map(_.copy(seq = next)) else addedDels
    // the attempt's own snapshot entry is the one past base's history
    val snap = attempt.snapshots.drop(base.snapshots.size).lastOption
      .map(s => s.copy(version = next, totalFiles = newFiles.size))
    Some(cur.copy(
      version = next,
      files = newFiles,
      fileStats = (cur.fileStats -- removed) ++
        attempt.fileStats.view.filterKeys(addedSet).toMap,
      fileRows = (cur.fileRows -- removed) ++
        attempt.fileRows.view.filterKeys(addedSet).toMap,
      // explicit seqs the attempt carried for its added files survive
      // (rollback restores historical seqs this way); commit() fills in
      // the rest structurally
      fileSeq = (cur.fileSeq -- removed) ++
        attempt.fileSeq.view.filterKeys(addedSet).toMap,
      deleteFiles = cur.deleteFiles.filterNot(removedDels) ++ rebasedDels,
      properties = (cur.properties -- propRemoved) ++ propChanged,
      snapshots = cur.snapshots ++ snap))
  }
}
