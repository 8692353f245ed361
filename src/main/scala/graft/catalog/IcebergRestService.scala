package graft.catalog

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Read-only Iceberg REST catalog endpoint over a graft warehouse —
  * the reference's catalog is inspected over REST (`README.md:454-565`
  * walks its REST resources); this serves the SAME protocol surface
  * for the tables this engine mirrors, per the public Iceberg REST
  * catalog OpenAPI specification (apache/iceberg
  * `rest-catalog-open-api.yaml`):
  *
  *  - `GET /v1/config` → `{"defaults": {}, "overrides": {}}`
  *  - `GET /v1/namespaces[?parent=a%1Fb]` → namespaces one level below
  *    the parent (top level when absent) that hold ≥1 exported table
  *    at any depth; multi-level namespaces use the spec's `%1F` unit
  *    separator in both path and query positions
  *  - `GET /v1/namespaces/{ns}` → the namespace + its properties
  *  - `GET /v1/namespaces/{ns}/tables` → table identifiers
  *  - `GET /v1/namespaces/{ns}/tables/{tbl}` → `LoadTableResult`:
  *    `metadata-location` + the inlined current metadata document
  *  - `HEAD` → the GET status with no body on every route (204 on a
  *    table, the spec's existence probe)
  *  - both listings paginate: `pageSize` bounds a page and
  *    `next-page-token` / `pageToken` continue it (keyset tokens, so
  *    a 10k-table namespace never produces one unbounded response)
  *
  * Served DIRECTLY from each table's mirror artifacts
  * (`metadata/version-hint.text` → `v<N>.metadata.json`) — the
  * response is byte-faithful to what the write-through mirror
  * published, so a REST client sees exactly the snapshot any
  * file-based external reader sees, with no second metadata source
  * that could drift. Read-only by design: writes go through the
  * engine (this endpoint exists so external engines can DISCOVER and
  * LOAD tables, the reference's R17 usage); every mutating verb gets
  * 405. Errors use the spec's error model. Zero dependencies: the
  * JDK's own HttpServer, daemon threads, ephemeral-port friendly
  * (`port = 0`), so specs and pipelines can embed it. */
object IcebergRestService {

  // The JDK HttpServer leaves Nagle's algorithm on; together with the
  // peer's delayed ACK that puts a ~40-50ms floor under every small
  // response, even warm cached ones on loopback (BENCH_META measured
  // ~48ms/request flat across routes). ServerConfig reads this
  // property once at class load — set it before any server exists,
  // never overriding an explicit user choice.
  if (System.getProperty("sun.net.httpserver.nodelay") == null)
    System.setProperty("sun.net.httpserver.nodelay", "true")

  final class Handle private[IcebergRestService] (
      server: HttpServer, val port: Int) {
    def stop(): Unit = server.stop(0)
    def uri: String = s"http://127.0.0.1:$port"
  }

  // ---- CALL-procedure registry (start/stop by bound port) ------------------
  private val running =
    new java.util.concurrent.ConcurrentHashMap[Int, Handle]()

  /** Start and register; returns the bound port (`CALL
    * system.start_rest_catalog(port)` — port 0 picks an ephemeral one,
    * the returned value is what a client connects to). */
  def register(warehouse: Path, port: Int): Int = {
    val h = start(warehouse, port)
    running.put(h.port, h)
    h.port
  }

  /** Stop a registered endpoint; true if one was running on `port`. */
  def stopPort(port: Int): Boolean =
    Option(running.remove(port)).exists { h => h.stop(); true }

  /** Stop every still-registered endpoint. `stop_rest_catalog` is the
    * ordinary path (and the q129 gate stops in `finally`), but a query
    * path that CRASHES between start and stop used to leak the
    * HttpServer (and its port) until JVM exit — this is the session
    * shutdown hook's teardown. */
  def stopAll(): Unit = {
    val it = running.keySet().iterator()
    while (it.hasNext) { stopPort(it.next()); () }
  }

  /** Session-lifecycle listener: closes leaked endpoints when the
    * SparkSession's application ends. One instance, installed at most
    * once per application by [[installLifecycleHook]]. */
  private[graft] val lifecycleListener =
    new org.apache.spark.scheduler.SparkListener {
      override def onApplicationEnd(
          e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
        stopAll()
    }

  private val hookAppId =
    new java.util.concurrent.atomic.AtomicReference[String](null)

  /** Install [[lifecycleListener]] on this session's context (once per
    * application — a fresh context after a stop() re-installs). */
  def installLifecycleHook(
      spark: org.apache.spark.sql.SparkSession): Unit = {
    val id = spark.sparkContext.applicationId
    if (hookAppId.getAndSet(id) != id)
      spark.sparkContext.addSparkListener(lifecycleListener)
  }

  /** A table dir serves over REST iff its Iceberg mirror exists (hint
    * present): REST is the EXTERNAL-engine view, and unexported tables
    * have no external snapshot to serve. */
  private def icebergHint(tableDir: Path): Option[Int] = {
    val hint = tableDir.resolve("metadata").resolve("version-hint.text")
    if (!Files.isRegularFile(hint)) None
    else scala.util.Try(Files.readString(hint).trim.toInt).toOption
  }

  private def isTable(dir: Path): Boolean = icebergHint(dir).isDefined

  /** Instrumentation: directories enumerated by the TREE-WALK
    * discovery paths since the last reset. Registry-backed listings
    * must leave this at zero (IcebergRestServiceSpec pins it) — before
    * the registry, every LIST request was an O(warehouse tree) walk,
    * multiplied by paging clients (the q129 BFS pages at pageSize=1). */
  private[graft] val walkedDirs = new java.util.concurrent.atomic.AtomicLong
  private[graft] def resetWalkCounterForTesting(): Unit = walkedDirs.set(0)

  private def tablesOf(ns: Path): Seq[String] =
    if (!Files.isDirectory(ns)) Nil
    else {
      walkedDirs.incrementAndGet()
      Fs.children(ns).filter(isTable).map(_.getFileName.toString).sorted
    }

  /** A directory serves as a namespace iff it is not itself a table
    * and some descendant is a mirrored table — REST is the
    * external-engine view, so namespace existence follows exported
    * content, at any depth (the engine's namespaces nest, and the
    * reference's own data model is two-level). */
  private def servesAsNamespace(dir: Path): Boolean =
    Files.isDirectory(dir) && !isTable(dir) && hasMirroredTable(dir)

  // depth-bounded: a symlink cycle under the warehouse must surface as
  // "not a namespace", never as a StackOverflowError (an Error escapes
  // the handler's NonFatal catch and leaves the exchange unanswered).
  // 64 levels is far beyond any real namespace nesting.
  private def hasMirroredTable(dir: Path, depth: Int = 0): Boolean = {
    walkedDirs.incrementAndGet()
    depth < 64 && Fs.children(dir).exists(c =>
      isTable(c) || (Files.isDirectory(c) && hasMirroredTable(c, depth + 1)))
  }

  private def childNamespacesOf(dir: Path): Seq[String] =
    if (!Files.isDirectory(dir)) Nil
    else {
      walkedDirs.incrementAndGet()
      Fs.children(dir).filter(servesAsNamespace)
        .map(_.getFileName.toString).sorted
    }

  /** One full-tree walk collecting every servable table's relative
    * path — the [[RestRegistry.ensure]] backfill at service start
    * (covers tables that predate the registry), and the shape the
    * registry-backed listings must stay equivalent to. */
  private[graft] def walkTables(warehouse: Path): Seq[String] = {
    val out = Vector.newBuilder[String]
    def rec(dir: Path, rel: String, depth: Int): Unit =
      if (depth < 64) {
        walkedDirs.incrementAndGet()
        Fs.children(dir).foreach { c =>
          if (Files.isDirectory(c)) {
            val r =
              if (rel.isEmpty) c.getFileName.toString
              else rel + "/" + c.getFileName.toString
            if (isTable(c)) out += r else rec(c, r, depth + 1)
          }
        }
      }
    rec(warehouse, "", 0)
    out.result()
  }

  /** The registry, parsed into the two listing shapes the routes
    * serve: tables per namespace and child namespaces per namespace
    * (a namespace "serves" iff ≥1 registered table lives at any depth
    * under it — same rule as the walk). */
  private final case class Listing(
      tablesByNs: Map[Seq[String], Seq[String]],
      childNsOf: Map[Seq[String], Seq[String]],
      namespaces: Set[Seq[String]])

  private def buildListing(entries: Set[String]): Listing = {
    val tables = scala.collection.mutable.Map
      .empty[Seq[String], scala.collection.mutable.TreeSet[String]]
    val childNs = scala.collection.mutable.Map
      .empty[Seq[String], scala.collection.mutable.TreeSet[String]]
    val nsSet = scala.collection.mutable.Set.empty[Seq[String]]
    entries.foreach { e =>
      val segs = e.split('/').toSeq.filter(_.nonEmpty)
      if (segs.length >= 2) { // tables live under ≥1 namespace level
        val ns = segs.init
        tables.getOrElseUpdate(ns,
          scala.collection.mutable.TreeSet.empty[String]) += segs.last
        (1 to ns.length).foreach(d => nsSet += ns.take(d))
        (0 until ns.length).foreach { d =>
          childNs.getOrElseUpdate(ns.take(d),
            scala.collection.mutable.TreeSet.empty[String]) += ns(d)
        }
      }
    }
    Listing(
      tables.iterator.map { case (k, v) => k -> v.toSeq }.toMap,
      childNs.iterator.map { case (k, v) => k -> v.toSeq }.toMap,
      nsSet.toSet)
  }

  /** The spec's multi-level namespace path/query encoding: levels
    * joined by the 0x1F unit separator (percent-encoded `%1F` on the
    * wire; decoding happens before this). */
  private[graft] val UnitSep = '\u001F'

  /** Keyset pagination over a sorted listing: the token is the
    * base64url of the last key the previous page returned, so a page
    * boundary is stable under concurrent table creation (an index
    * token would shift and skip or repeat entries). Returns the page
    * and the `next-page-token` to emit, if any. */
  private[graft] def page(sorted: Seq[String], pageToken: Option[String],
      pageSize: Option[Int]): (Seq[String], Option[String]) = {
    val after = pageToken.map(t => new String(
      java.util.Base64.getUrlDecoder.decode(t), StandardCharsets.UTF_8))
    val rest = after match {
      case Some(a) => sorted.dropWhile(_ <= a)
      case None => sorted
    }
    pageSize.map(_.max(1)) match {
      case Some(n) if rest.size > n =>
        val pg = rest.take(n)
        (pg, Some(java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(
          pg.last.getBytes(StandardCharsets.UTF_8))))
      case Some(n) => (rest.take(n), None)
      case None => (rest, None)
    }
  }

  /** Percent-decode ONE path/query segment, exactly once. NOT
    * URLDecoder: that implements application/x-www-form-urlencoded,
    * whose '+'→space rule corrupts legitimate names, and applying it
    * to an already-decoded `URI.getPath` double-decoded — a name
    * containing '%' got a 500 and a once-encoded `%252e%252e` became
    * '..' only after the second pass. Invalid escapes throw
    * IllegalArgumentException (the caller answers 400). */
  private[graft] def pctDecode(seg: String): String = {
    if (!seg.contains('%')) return seg
    val out = new java.io.ByteArrayOutputStream(seg.length)
    var i = 0
    while (i < seg.length) {
      val c = seg.charAt(i)
      if (c == '%') {
        if (i + 2 >= seg.length)
          throw new IllegalArgumentException(s"truncated percent escape in: $seg")
        val hi = Character.digit(seg.charAt(i + 1), 16)
        val lo = Character.digit(seg.charAt(i + 2), 16)
        if (hi < 0 || lo < 0)
          throw new IllegalArgumentException(s"invalid percent escape in: $seg")
        out.write((hi << 4) | lo)
        i += 3
      } else {
        // encode by CODE POINT, not char: a raw unencoded supplementary
        // character (non-RFC-conformant client) arrives as a surrogate
        // pair, and per-char getBytes would encode each half to the
        // replacement sequence — silently mangling the segment instead
        // of resolving the name the client meant
        val cp = seg.codePointAt(i)
        out.write(new String(Character.toChars(cp)).getBytes(StandardCharsets.UTF_8))
        i += Character.charCount(cp)
      }
    }
    new String(out.toByteArray, StandardCharsets.UTF_8)
  }

  def start(warehouse: Path, port: Int = 0): Handle = {
    // ---- registry-backed discovery (O(page) listings) -----------------
    // ensure() backfills the registry with ONE tree walk at service
    // start (covering tables that predate it); from then on the
    // commit/drop hooks maintain it ([[RestRegistry]]) and every
    // listing request is served from this mtime-invalidated parse —
    // O(page), where it used to be O(warehouse tree) PER REQUEST. A
    // registry that cannot exist (unwritable warehouse root) leaves
    // listing() empty and the routes fall back to the walk.
    RestRegistry.ensure(warehouse, () => walkTables(warehouse))
    val regFile = RestRegistry.registryFile(warehouse)
    val listingCache = new java.util.concurrent.atomic.AtomicReference[
      (Long, java.nio.file.attribute.FileTime, Listing)](null)
    def regFingerprint(): Option[(Long, java.nio.file.attribute.FileTime)] =
      TableMetadata.fileFingerprint(regFile)
    // fingerprint FIRST, content second — a registration landing
    // between the two leaves newer content cached under an older
    // fingerprint, which merely refreshes on the next request. (The
    // reverse order would cache pre-registration content under the
    // post-registration fingerprint: a table discoverable by name but
    // missing from LIST until some unrelated registry write.)
    def fromFile(): Option[Listing] = regFingerprint().flatMap { case (s, m) =>
      val c = listingCache.get()
      if (c != null && c._1 == s && c._2 == m) Some(c._3)
      else RestRegistry.readEntries(warehouse).map { es =>
        val l = buildListing(es)
        listingCache.set((s, m, l))
        l
      }
    }
    def listing(): Option[Listing] = fromFile().orElse {
      // registry deleted out-of-band since start: one walk re-creates
      // it (self-healing), then the same fingerprint-first read serves
      RestRegistry.ensure(warehouse, () => walkTables(warehouse))
      fromFile()
    }
    // loadTable responses cached by the metadata document's
    // fingerprint (LRU 64): a discovery client loads MANY tables, and
    // each response otherwise re-reads + re-parses + re-renders the
    // full document per request. The documents are immutable between
    // exports; a new export (new hint, or a same-version in-place
    // swap) changes the fingerprint and the entry drops.
    val loadCache = new java.util.LinkedHashMap[
      String, (Long, java.nio.file.attribute.FileTime, Array[Byte])](
      64, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[
        String, (Long, java.nio.file.attribute.FileTime, Array[Byte])])
          : Boolean = size > 64
    }
    def loadTableBytes(metaFile: Path): Option[Array[Byte]] =
      TableMetadata.fileFingerprint(metaFile).map { case (s, m) =>
        val key = metaFile.toAbsolutePath.normalize.toString
        loadCache.synchronized(Option(loadCache.get(key))) match {
          case Some((cs, cm, b)) if cs == s && cm == m => b
          case _ =>
            val body = JsonMethods.compact(JsonMethods.render(JObject(
              "metadata-location" -> JString(metaFile.toUri.toString),
              // byte-faithful: the mirror's own document, re-emitted
              "metadata" -> JsonMethods.parse(Files.readString(metaFile)),
              "config" -> JObject()))).getBytes(StandardCharsets.UTF_8)
            loadCache.synchronized { loadCache.put(key, (s, m, body)); () }
            body
        }
      }
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4,
      (r: Runnable) => { val t = new Thread(r, "graft-rest"); t.setDaemon(true); t }))

    // HEAD = the same status line and headers with no body, on EVERY
    // route (the JDK HttpServer treats a body write on a HEAD exchange
    // as a protocol error — clients saw stream errors on existence
    // probes against /v1/config and the listing routes)
    def send(x: HttpExchange, code: Int, body: JValue): Unit = {
      x.getResponseHeaders.set("Content-Type", "application/json")
      if (x.getRequestMethod == "HEAD") {
        x.sendResponseHeaders(code, -1L)
        x.close()
      } else {
        val bytes =
          JsonMethods.compact(JsonMethods.render(body)).getBytes(StandardCharsets.UTF_8)
        x.sendResponseHeaders(code, bytes.length.toLong)
        val os = x.getResponseBody
        try os.write(bytes) finally os.close()
      }
    }
    // the spec's ErrorModel, wrapped in {"error": ...}
    def err(x: HttpExchange, code: Int, tpe: String, msg: String): Unit =
      send(x, code, JObject("error" -> JObject(
        "message" -> JString(msg), "type" -> JString(tpe), "code" -> JInt(code))))
    def notFound(x: HttpExchange, what: String, name: String): Unit =
      err(x, 404, s"NoSuch${what}Exception", s"$what does not exist: $name")
    def safe(seg: String): Boolean =
      seg.nonEmpty && !seg.contains('/') && !seg.contains('\\') &&
        seg != "." && seg != ".."
    // a decoded {namespace} path/query value is one-or-more levels
    // joined by the spec's 0x1F unit separator
    def levelsOf(decoded: String): Seq[String] =
      decoded.split(UnitSep).toSeq.filter(_.nonEmpty)
    def nsJson(levels: Seq[String]): JArray =
      JArray(levels.map(JString(_)).toList)
    def nsName(levels: Seq[String]): String = levels.mkString(".")
    def nsDir(levels: Seq[String]): Path =
      levels.foldLeft(warehouse)(_.resolve(_))

    server.createContext("/v1/", (x: HttpExchange) => try {
      val method = x.getRequestMethod
      // decode each RAW segment exactly once (getPath pre-decodes, so
      // decoding it again mangled '%'/'+' names and re-assembled
      // once-encoded traversal sequences)
      val decoded =
        try Right(x.getRequestURI.getRawPath.split('/')
          .drop(2).filter(_.nonEmpty).map(pctDecode).toSeq) // after /v1
        catch { case e: IllegalArgumentException => Left(e.getMessage) }
      // a malformed escape in a query value must be a 400, not a
      // silently dropped parameter (?parent=bad%zz answering the
      // TOP-LEVEL listing would hand a tree-walking client wrong
      // results instead of an error)
      val queryOrErr: Either[String, Map[String, String]] =
        try Right(Option(x.getRequestURI.getRawQuery).getOrElse("")
          .split('&').filter(_.nonEmpty).map { kv =>
            val (k, v) = kv.split("=", 2) match {
              case Array(k2, v2) => (k2, v2)
              case Array(k2) => (k2, "")
            }
            pctDecode(k) -> pctDecode(v)
          }.toMap)
        catch { case e: IllegalArgumentException => Left(e.getMessage) }
      val query = queryOrErr.getOrElse(Map.empty)
      val pageToken = query.get("pageToken").filter(_.nonEmpty)
      // a pageToken that is not base64url is a client error, not a 500
      val pageTokenValid = pageToken.forall(t =>
        try { java.util.Base64.getUrlDecoder.decode(t); true }
        catch { case _: IllegalArgumentException => false })
      val pageSize = query.get("pageSize").flatMap(_.toIntOption)
      // `keep` re-validates registry-served rows against the
      // filesystem AFTER paging (O(page) stats): an out-of-band
      // deletion costs a short page, never a phantom row — and the
      // keyset token stays anchored to the unfiltered sorted list, so
      // a filtered row can't skip its successors
      def paged(sorted: Seq[String], key: String,
          render: String => JValue,
          keep: String => Boolean = _ => true): JObject = {
        val (pg, next) = page(sorted, pageToken, pageSize)
        JObject(List(key -> JArray(pg.filter(keep).map(render).toList)) ++
          next.map(t => "next-page-token" -> JString(t): JField).toList)
      }
      // a namespace serves iff ≥1 registered table lives under it (the
      // registry's view), it is still a directory, and is not itself a
      // table — the two stats keep parity with the walk's semantics
      // against out-of-band changes, at O(1) per request
      def nsServes(l: Listing, levels: Seq[String]): Boolean =
        l.namespaces.contains(levels) && {
          val d = nsDir(levels)
          Files.isDirectory(d) && !isTable(d)
        }
      if (method != "GET" && method != "HEAD") {
        err(x, 405, "UnsupportedOperationException",
          "this catalog endpoint is read-only: writes go through the engine")
      } else if (queryOrErr.isLeft) {
        err(x, 400, "BadRequestException",
          s"malformed percent escape in query: ${queryOrErr.left.getOrElse("")}")
      } else if (!pageTokenValid) {
        err(x, 400, "BadRequestException",
          s"malformed pageToken: not base64url")
      } else decoded match {
        case Left(msg) =>
          err(x, 400, "BadRequestException", s"malformed percent escape: $msg")
        case Right(segs) => segs match {
          case Seq("config") =>
            send(x, 200, JObject(
              "defaults" -> JObject(), "overrides" -> JObject()))
          case Seq("namespaces") =>
            // ?parent=<%1F-joined levels> lists one level below the
            // parent; absent parent lists the top level. Each entry is
            // the FULL namespace path (the spec's ListNamespacesResponse)
            val parent = levelsOf(query.getOrElse("parent", ""))
            if (parent.exists(l => !safe(l)))
              err(x, 400, "BadRequestException",
                s"malformed parent namespace: ${query("parent")}")
            else listing() match {
              case Some(l) =>
                if (parent.nonEmpty && !nsServes(l, parent))
                  notFound(x, "Namespace", nsName(parent))
                else send(x, 200, paged(
                  l.childNsOf.getOrElse(parent, Nil), "namespaces",
                  n => nsJson(parent :+ n),
                  // same out-of-band defense tables get: an rm -rf'd
                  // namespace whose lines went stale must not be
                  // LISTED here only to 404 on its own routes
                  keep = n => Files.isDirectory(nsDir(parent :+ n))))
              case None => // no registry possible: per-request walk
                if (parent.nonEmpty && !servesAsNamespace(nsDir(parent)))
                  notFound(x, "Namespace", nsName(parent))
                else send(x, 200, paged(
                  childNamespacesOf(nsDir(parent)), "namespaces",
                  n => nsJson(parent :+ n)))
            }
          case Seq("namespaces", ns) =>
            val levels = levelsOf(ns)
            if (levels.isEmpty || levels.exists(l => !safe(l)))
              err(x, 400, "BadRequestException", s"malformed namespace: $ns")
            else {
              val serves = listing() match {
                case Some(l) => nsServes(l, levels)
                case None => servesAsNamespace(nsDir(levels))
              }
              if (!serves) notFound(x, "Namespace", nsName(levels))
              else send(x, 200, JObject(
                "namespace" -> nsJson(levels),
                "properties" -> JObject()))
            }
          case Seq("namespaces", ns, "tables") =>
            val levels = levelsOf(ns)
            if (levels.isEmpty || levels.exists(l => !safe(l)))
              err(x, 400, "BadRequestException", s"malformed namespace: $ns")
            else listing() match {
              case Some(l) =>
                if (!nsServes(l, levels))
                  notFound(x, "Namespace", nsName(levels))
                else send(x, 200, paged(
                  l.tablesByNs.getOrElse(levels, Nil), "identifiers",
                  t => JObject(
                    "namespace" -> nsJson(levels),
                    "name" -> JString(t)),
                  keep = t => isTable(nsDir(levels).resolve(t))))
              case None =>
                if (!servesAsNamespace(nsDir(levels)))
                  notFound(x, "Namespace", nsName(levels))
                else send(x, 200, paged(
                  tablesOf(nsDir(levels)), "identifiers",
                  t => JObject(
                    "namespace" -> nsJson(levels),
                    "name" -> JString(t))))
            }
          case Seq("namespaces", ns, "tables", t) =>
            val levels = levelsOf(ns)
            if (levels.isEmpty || levels.exists(l => !safe(l)) || !safe(t))
              err(x, 400, "BadRequestException", s"malformed identifier: $ns.$t")
            else {
              val dir = nsDir(levels).resolve(t)
              icebergHint(dir) match {
                case None => notFound(x, "Table", s"${nsName(levels)}.$t")
                case Some(hint) =>
                  val metaFile =
                    dir.resolve("metadata").resolve(s"v$hint.metadata.json")
                  if (!Files.isRegularFile(metaFile))
                    notFound(x, "Table", s"${nsName(levels)}.$t")
                  else if (method == "HEAD") { x.sendResponseHeaders(204, -1); x.close() }
                  else loadTableBytes(metaFile) match {
                    case None => // raced away between the check and the read
                      notFound(x, "Table", s"${nsName(levels)}.$t")
                    case Some(body) =>
                      x.getResponseHeaders.set("Content-Type", "application/json")
                      x.sendResponseHeaders(200, body.length.toLong)
                      val os = x.getResponseBody
                      try os.write(body) finally os.close()
                  }
              }
            }
          case _ => err(x, 404, "NoSuchRouteException",
            s"unknown route: ${x.getRequestURI.getPath}")
        }
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        try err(x, 500, e.getClass.getSimpleName,
          Option(e.getMessage).getOrElse("").take(200))
        catch { case _: Exception => () }
    } finally x.close())

    server.start()
    new Handle(server, server.getAddress.getPort)
  }
}
