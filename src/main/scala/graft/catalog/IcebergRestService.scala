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

  /** A table dir serves over REST iff its Iceberg mirror exists (hint
    * present): REST is the EXTERNAL-engine view, and unexported tables
    * have no external snapshot to serve. */
  private def icebergHint(tableDir: Path): Option[Int] = {
    val hint = tableDir.resolve("metadata").resolve("version-hint.text")
    if (!Files.isRegularFile(hint)) None
    else scala.util.Try(Files.readString(hint).trim.toInt).toOption
  }

  private def isTable(dir: Path): Boolean = icebergHint(dir).isDefined

  private def tablesOf(ns: Path): Seq[String] =
    if (!Files.isDirectory(ns)) Nil
    else Fs.children(ns).filter(isTable).map(_.getFileName.toString).sorted

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
  private def hasMirroredTable(dir: Path, depth: Int = 0): Boolean =
    depth < 64 && Fs.children(dir).exists(c =>
      isTable(c) || (Files.isDirectory(c) && hasMirroredTable(c, depth + 1)))

  private def childNamespacesOf(dir: Path): Seq[String] =
    if (!Files.isDirectory(dir)) Nil
    else Fs.children(dir).filter(servesAsNamespace)
      .map(_.getFileName.toString).sorted

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
      def paged(sorted: Seq[String], key: String,
          render: String => JValue): JObject = {
        val (pg, next) = page(sorted, pageToken, pageSize)
        JObject(List(key -> JArray(pg.map(render).toList)) ++
          next.map(t => "next-page-token" -> JString(t): JField).toList)
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
            else if (parent.nonEmpty && !servesAsNamespace(nsDir(parent)))
              notFound(x, "Namespace", nsName(parent))
            else send(x, 200, paged(
              childNamespacesOf(nsDir(parent)), "namespaces",
              n => nsJson(parent :+ n)))
          case Seq("namespaces", ns) =>
            val levels = levelsOf(ns)
            if (levels.isEmpty || levels.exists(l => !safe(l)))
              err(x, 400, "BadRequestException", s"malformed namespace: $ns")
            else if (!servesAsNamespace(nsDir(levels)))
              notFound(x, "Namespace", nsName(levels))
            else send(x, 200, JObject(
              "namespace" -> nsJson(levels),
              "properties" -> JObject()))
          case Seq("namespaces", ns, "tables") =>
            val levels = levelsOf(ns)
            if (levels.isEmpty || levels.exists(l => !safe(l)))
              err(x, 400, "BadRequestException", s"malformed namespace: $ns")
            else if (!servesAsNamespace(nsDir(levels)))
              notFound(x, "Namespace", nsName(levels))
            else send(x, 200, paged(
              tablesOf(nsDir(levels)), "identifiers",
              t => JObject(
                "namespace" -> nsJson(levels),
                "name" -> JString(t))))
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
                  else send(x, 200, JObject(
                    "metadata-location" -> JString(metaFile.toUri.toString),
                    // byte-faithful: the mirror's own document, re-emitted
                    "metadata" -> JsonMethods.parse(Files.readString(metaFile)),
                    "config" -> JObject()))
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
