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
  *  - `GET /v1/namespaces` → namespaces holding ≥1 exported table
  *  - `GET /v1/namespaces/{ns}` → the namespace + its properties
  *  - `GET /v1/namespaces/{ns}/tables` → table identifiers
  *  - `GET /v1/namespaces/{ns}/tables/{tbl}` → `LoadTableResult`:
  *    `metadata-location` + the inlined current metadata document
  *  - `HEAD` on a table → 204/404 (existence check)
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

  private def tablesOf(ns: Path): Seq[String] =
    if (!Files.isDirectory(ns)) Nil
    else Fs.children(ns).filter(t => icebergHint(t).isDefined)
      .map(_.getFileName.toString).sorted

  def start(warehouse: Path, port: Int = 0): Handle = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4,
      (r: Runnable) => { val t = new Thread(r, "graft-rest"); t.setDaemon(true); t }))

    def send(x: HttpExchange, code: Int, body: JValue): Unit = {
      val bytes =
        JsonMethods.compact(JsonMethods.render(body)).getBytes(StandardCharsets.UTF_8)
      x.getResponseHeaders.set("Content-Type", "application/json")
      x.sendResponseHeaders(code, bytes.length.toLong)
      val os = x.getResponseBody
      try os.write(bytes) finally os.close()
    }
    // the spec's ErrorModel, wrapped in {"error": ...}
    def err(x: HttpExchange, code: Int, tpe: String, msg: String): Unit =
      send(x, code, JObject("error" -> JObject(
        "message" -> JString(msg), "type" -> JString(tpe), "code" -> JInt(code))))
    def notFound(x: HttpExchange, what: String, name: String): Unit =
      err(x, 404, s"NoSuch${what}Exception", s"$what does not exist: $name")
    // path segments are URL-encoded; namespaces may be multi-level
    // joined with the spec's %1F unit separator — we serve one level
    def dec(s: String): String =
      java.net.URLDecoder.decode(s, StandardCharsets.UTF_8)
    def safe(seg: String): Boolean =
      seg.nonEmpty && !seg.contains('/') && !seg.contains('\\') &&
        seg != "." && seg != ".."

    server.createContext("/v1/", (x: HttpExchange) => try {
      val segs = x.getRequestURI.getPath.split('/')
        .drop(2).filter(_.nonEmpty).map(dec).toSeq // after /v1
      val method = x.getRequestMethod
      if (method != "GET" && method != "HEAD") {
        err(x, 405, "UnsupportedOperationException",
          "this catalog endpoint is read-only: writes go through the engine")
      } else segs match {
        case Seq("config") =>
          send(x, 200, JObject(
            "defaults" -> JObject(), "overrides" -> JObject()))
        case Seq("namespaces") =>
          val nss = Fs.children(warehouse)
            .filter(d => Files.isDirectory(d) && tablesOf(d).nonEmpty)
            .map(_.getFileName.toString).sorted
          send(x, 200, JObject("namespaces" -> JArray(
            nss.map(n => JArray(List(JString(n)))).toList)))
        case Seq("namespaces", ns) if safe(ns) =>
          if (tablesOf(warehouse.resolve(ns)).isEmpty) notFound(x, "Namespace", ns)
          else send(x, 200, JObject(
            "namespace" -> JArray(List(JString(ns))),
            "properties" -> JObject()))
        case Seq("namespaces", ns, "tables") if safe(ns) =>
          val ts = tablesOf(warehouse.resolve(ns))
          if (ts.isEmpty) notFound(x, "Namespace", ns)
          else send(x, 200, JObject("identifiers" -> JArray(ts.map(t =>
            JObject(
              "namespace" -> JArray(List(JString(ns))),
              "name" -> JString(t))).toList)))
        case Seq("namespaces", ns, "tables", t) if safe(ns) && safe(t) =>
          val dir = warehouse.resolve(ns).resolve(t)
          icebergHint(dir) match {
            case None => notFound(x, "Table", s"$ns.$t")
            case Some(hint) =>
              val metaFile =
                dir.resolve("metadata").resolve(s"v$hint.metadata.json")
              if (!Files.isRegularFile(metaFile)) notFound(x, "Table", s"$ns.$t")
              else if (method == "HEAD") { x.sendResponseHeaders(204, -1); x.close() }
              else send(x, 200, JObject(
                "metadata-location" -> JString(metaFile.toUri.toString),
                // byte-faithful: the mirror's own document, re-emitted
                "metadata" -> JsonMethods.parse(Files.readString(metaFile)),
                "config" -> JObject()))
          }
        case _ => err(x, 404, "NoSuchRouteException",
          s"unknown route: ${x.getRequestURI.getPath}")
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
