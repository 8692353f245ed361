package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths}

import scala.sys.process.{Process, ProcessLogger}

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The read-only Iceberg REST catalog endpoint
  * ([[graft.catalog.IcebergRestService]]): the reference's catalog is
  * inspected over REST, so ours serves the same public protocol
  * surface — config, namespace/table discovery, loadTable — directly
  * from the mirror artifacts. Asserts the spec shapes over real HTTP
  * (JDK HttpClient), the error model, read-only enforcement, and that
  * the independent python reader can consume a table DISCOVERED via
  * REST instead of the filesystem hint. */
class IcebergRestServiceSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val http = HttpClient.newHttpClient()
  private def get(uri: String): (Int, String) = {
    val r = http.send(
      HttpRequest.newBuilder(URI.create(uri)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }
  private def json(body: String): Map[String, JValue] =
    JsonMethods.parse(body).asInstanceOf[JObject].obj.toMap
  // a request whose path the JDK URI parser itself rejects (malformed
  // percent escape) — written straight onto the socket
  private def rawGetStatus(port: Int, path: String): Int = {
    val s = new java.net.Socket("127.0.0.1", port)
    try {
      val out = s.getOutputStream
      out.write((s"GET $path HTTP/1.1\r\nHost: 127.0.0.1:$port\r\n" +
        "Connection: close\r\n\r\n").getBytes("US-ASCII"))
      out.flush()
      val line = new java.io.BufferedReader(
        new java.io.InputStreamReader(s.getInputStream)).readLine()
      line.split(' ')(1).toInt
    } finally s.close()
  }

  private def fixture(): Int = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.rest_ns")
    spark.sql("DROP TABLE IF EXISTS lakehouse.rest_ns.rt")
    spark.sql("CREATE TABLE lakehouse.rest_ns.rt (k INT, v STRING) " +
      "TBLPROPERTIES ('graft.iceberg.mirror'='true')")
    Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
      .createOrReplaceTempView("rest_src")
    spark.sql("INSERT INTO lakehouse.rest_ns.rt SELECT * FROM rest_src")
    spark.sql("CALL lakehouse.system.start_rest_catalog(0)")
      .collect()(0).getLong(0).toInt
  }

  test("REST protocol surface: config, discovery, loadTable, errors, read-only") {
    val port = fixture()
    try {
      val base = s"http://127.0.0.1:$port/v1"

      val (cc, cb) = get(s"$base/config")
      cc shouldBe 200
      json(cb).keySet should contain allOf ("defaults", "overrides")

      val (nc, nb) = get(s"$base/namespaces")
      nc shouldBe 200
      val nss = json(nb)("namespaces").asInstanceOf[JArray].arr
        .map(_.asInstanceOf[JArray].arr.map(_.asInstanceOf[JString].s))
      nss should contain(List("rest_ns"))

      val (oc, ob) = get(s"$base/namespaces/rest_ns")
      oc shouldBe 200
      json(ob)("namespace") shouldBe JArray(List(JString("rest_ns")))

      val (tc, tb) = get(s"$base/namespaces/rest_ns/tables")
      tc shouldBe 200
      json(tb)("identifiers").asInstanceOf[JArray].arr
        .map(_.asInstanceOf[JObject].obj.toMap.apply("name")) should
        contain(JString("rt"))

      // loadTable: metadata-location + the INLINED mirror document —
      // byte-faithful (same current-snapshot-id the file holds)
      val (lc, lb) = get(s"$base/namespaces/rest_ns/tables/rt")
      lc shouldBe 200
      val load = json(lb)
      val loc = load("metadata-location").asInstanceOf[JString].s
      loc should startWith("file:")
      val inlined = load("metadata").asInstanceOf[JObject].obj.toMap
      inlined("format-version") shouldBe JInt(2)
      val onDisk = JsonMethods.parse(
        Files.readString(Paths.get(URI.create(loc))))
        .asInstanceOf[JObject].obj.toMap
      inlined("current-snapshot-id") shouldBe onDisk("current-snapshot-id")

      // a NEW commit moves what REST serves (write-through mirror)
      spark.sql("INSERT INTO lakehouse.rest_ns.rt VALUES (4, 'd')")
      val (l2c, l2b) = get(s"$base/namespaces/rest_ns/tables/rt")
      l2c shouldBe 200
      json(l2b)("metadata").asInstanceOf[JObject].obj.toMap
        .apply("current-snapshot-id") should not be
        inlined("current-snapshot-id")

      // spec error model on misses; traversal-shaped segments rejected
      val (m1, mb1) = get(s"$base/namespaces/rest_ns/tables/nope")
      m1 shouldBe 404
      json(mb1)("error").asInstanceOf[JObject].obj.toMap
        .apply("type") shouldBe JString("NoSuchTableException")
      get(s"$base/namespaces/no_such_ns")._1 shouldBe 404
      // a decoded '..' level is malformed on its face (BadRequest, not
      // a 404 that implies the name merely doesn't exist)
      get(s"$base/namespaces/%2e%2e/tables")._1 shouldBe 400
      // once-encoded %252e%252e decodes ONCE to the literal '%2e%2e' —
      // a (weird but legal) name that simply doesn't exist: 404. The
      // old double-decode turned it into '..'
      get(s"$base/namespaces/%252e%252e")._1 shouldBe 404
      // a malformed escape is a 400, not a 500 (the JDK client refuses
      // to even build such a URI, so probe over a raw socket)
      rawGetStatus(port, "/v1/namespaces/bad%zz") shouldBe 400
      // ...in a QUERY value too: silently dropping the parent would
      // answer the top-level listing to a client asking for a subtree
      rawGetStatus(port, "/v1/namespaces?parent=bad%zz") shouldBe 400

      // read-only: every mutating verb is refused
      val del = http.send(
        HttpRequest.newBuilder(
          URI.create(s"$base/namespaces/rest_ns/tables/rt")).DELETE().build(),
        HttpResponse.BodyHandlers.ofString())
      del.statusCode() shouldBe 405

      // HEAD existence probe
      val head = http.send(
        HttpRequest.newBuilder(URI.create(s"$base/namespaces/rest_ns/tables/rt"))
          .method("HEAD", HttpRequest.BodyPublishers.noBody()).build(),
        HttpResponse.BodyHandlers.ofString())
      head.statusCode() shouldBe 204
      // HEAD works headers-only on every OTHER route too (the JDK
      // server errors the stream if a handler writes a body on HEAD —
      // existence probes on /v1/config and listings used to see 500s)
      for (r <- Seq(s"$base/config", s"$base/namespaces",
          s"$base/namespaces/rest_ns", s"$base/namespaces/rest_ns/tables")) {
        val h = http.send(
          HttpRequest.newBuilder(URI.create(r))
            .method("HEAD", HttpRequest.BodyPublishers.noBody()).build(),
          HttpResponse.BodyHandlers.ofString())
        h.statusCode() shouldBe 200
        h.body() shouldBe empty
      }
      val hMiss = http.send(
        HttpRequest.newBuilder(URI.create(s"$base/namespaces/no_such_ns"))
          .method("HEAD", HttpRequest.BodyPublishers.noBody()).build(),
        HttpResponse.BodyHandlers.ofString())
      hMiss.statusCode() shouldBe 404
    } finally {
      spark.sql(s"CALL lakehouse.system.stop_rest_catalog($port)")
        .collect()(0).getLong(0) shouldBe 1L
    }
    // stopped: the port no longer answers
    an[Exception] should be thrownBy get(s"http://127.0.0.1:$port/v1/config")
  }

  test("multi-level namespaces: %1F-joined discovery, parent walk, loadTable") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.rest_ml")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.rest_ml.sub")
    spark.sql("DROP TABLE IF EXISTS lakehouse.rest_ml.sub.deep")
    spark.sql("CREATE TABLE lakehouse.rest_ml.sub.deep (k INT) " +
      "TBLPROPERTIES ('graft.iceberg.mirror'='true')")
    spark.sql("INSERT INTO lakehouse.rest_ml.sub.deep VALUES (1), (2)")
    val port = spark.sql("CALL lakehouse.system.start_rest_catalog(0)")
      .collect()(0).getLong(0).toInt
    try {
      val base = s"http://127.0.0.1:$port/v1"
      // top level shows rest_ml even though its only table is nested
      val (nc, nb) = get(s"$base/namespaces")
      nc shouldBe 200
      val tops = json(nb)("namespaces").asInstanceOf[JArray].arr
        .map(_.asInstanceOf[JArray].arr.map(_.asInstanceOf[JString].s))
      tops should contain(List("rest_ml"))
      // parent walk: one level below rest_ml, full paths returned
      val (pc, pb) = get(s"$base/namespaces?parent=rest_ml")
      pc shouldBe 200
      json(pb)("namespaces").asInstanceOf[JArray].arr
        .map(_.asInstanceOf[JArray].arr.map(_.asInstanceOf[JString].s)) shouldBe
        List(List("rest_ml", "sub"))
      // the nested namespace resource, %1F-joined
      val (oc, ob) = get(s"$base/namespaces/rest_ml%1Fsub")
      oc shouldBe 200
      json(ob)("namespace") shouldBe
        JArray(List(JString("rest_ml"), JString("sub")))
      // tables under it, and loadTable through the nested path
      val (tc, tb) = get(s"$base/namespaces/rest_ml%1Fsub/tables")
      tc shouldBe 200
      json(tb)("identifiers").asInstanceOf[JArray].arr
        .map(_.asInstanceOf[JObject].obj.toMap) should matchPattern {
        case List(m: Map[_, _]) if m.asInstanceOf[Map[String, JValue]]("name") == JString("deep") =>
      }
      val (lc, lb) = get(s"$base/namespaces/rest_ml%1Fsub/tables/deep")
      lc shouldBe 200
      json(lb)("metadata").asInstanceOf[JObject].obj.toMap
        .apply("format-version") shouldBe JInt(2)
      // the INTERMEDIATE namespace exists but holds no direct tables:
      // its listing is an EMPTY page, not a 404 (it demonstrably
      // exists — a client walking parent-by-parent must not dead-end)
      val (ec, eb) = get(s"$base/namespaces/rest_ml/tables")
      ec shouldBe 200
      json(eb)("identifiers") shouldBe JArray(Nil)
      // a nested path that doesn't exist is still a 404
      get(s"$base/namespaces/rest_ml%1Fnope")._1 shouldBe 404
    } finally {
      spark.sql(s"CALL lakehouse.system.stop_rest_catalog($port)")
      spark.sql("DROP TABLE IF EXISTS lakehouse.rest_ml.sub.deep")
    }
  }

  test("pagination: pageSize bounds a listing and pageToken walks it to exhaustion") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.rest_pg")
    for (t <- Seq("pa", "pb", "pc")) {
      spark.sql(s"DROP TABLE IF EXISTS lakehouse.rest_pg.$t")
      spark.sql(s"CREATE TABLE lakehouse.rest_pg.$t (k INT) " +
        "TBLPROPERTIES ('graft.iceberg.mirror'='true')")
      spark.sql(s"INSERT INTO lakehouse.rest_pg.$t VALUES (1)")
    }
    val port = spark.sql("CALL lakehouse.system.start_rest_catalog(0)")
      .collect()(0).getLong(0).toInt
    try {
      val base = s"http://127.0.0.1:$port/v1"
      var token: Option[String] = None
      var pages = 0
      val seen = scala.collection.mutable.ListBuffer.empty[String]
      var more = true
      while (more && pages < 10) {
        val tok = token.map(t => s"&pageToken=$t").getOrElse("")
        val (c, b) = get(s"$base/namespaces/rest_pg/tables?pageSize=1$tok")
        c shouldBe 200
        val o = json(b)
        seen ++= o("identifiers").asInstanceOf[JArray].arr
          .map(_.asInstanceOf[JObject].obj.toMap.apply("name")
            .asInstanceOf[JString].s)
        pages += 1
        token = o.get("next-page-token").map(_.asInstanceOf[JString].s)
        more = token.isDefined
      }
      pages shouldBe 3 // one per table; the last page carries no token
      seen.toList shouldBe List("pa", "pb", "pc") // sorted, no dup/skip
      // a garbage pageToken is a client error, not a 500
      get(s"$base/namespaces/rest_pg/tables?pageSize=1&pageToken=!!not-b64!!")
        ._1 shouldBe 400
      // an unpaged request still returns everything at once
      val (fc, fb) = get(s"$base/namespaces/rest_pg/tables")
      fc shouldBe 200
      json(fb)("identifiers").asInstanceOf[JArray].arr should have size 3
      json(fb).contains("next-page-token") shouldBe false
    } finally {
      spark.sql(s"CALL lakehouse.system.stop_rest_catalog($port)")
      for (t <- Seq("pa", "pb", "pc"))
        spark.sql(s"DROP TABLE IF EXISTS lakehouse.rest_pg.$t")
    }
  }

  test("pctDecode: exactly-once percent decoding with no form-encoding '+' rule") {
    import graft.catalog.IcebergRestService.{pctDecode, UnitSep}
    pctDecode("plain") shouldBe "plain"
    pctDecode("a%20b") shouldBe "a b"
    pctDecode("a+b") shouldBe "a+b" // URLDecoder would say "a b"
    pctDecode("pct%25name") shouldBe "pct%name" // '%' names survive one pass
    pctDecode("ns%1Fsub").toSeq shouldBe s"ns${UnitSep}sub".toSeq
    pctDecode("caf%C3%A9") shouldBe "café" // multi-byte UTF-8
    an[IllegalArgumentException] should be thrownBy pctDecode("bad%zz")
    an[IllegalArgumentException] should be thrownBy pctDecode("trunc%2")
  }

  test("page: keyset tokens are stable under concurrent inserts") {
    import graft.catalog.IcebergRestService.page
    val (p1, t1) = page(Seq("a", "b", "c"), None, Some(2))
    p1 shouldBe Seq("a", "b")
    // a new entry lands BEFORE the boundary between pages: the keyset
    // token (after "b") neither re-serves a page-1 name nor skips "c"
    val (p2, t2) = page(Seq("a", "ab", "b", "c"), t1, Some(2))
    p2 shouldBe Seq("c")
    t2 shouldBe None
    // no pageSize = the whole listing, no token
    page(Seq("x", "y"), None, None) shouldBe ((Seq("x", "y"), None))
    // pageSize clamps to >=1 (a 0 would loop a client forever)
    page(Seq("x", "y"), None, Some(0))._1 shouldBe Seq("x")
  }

  test("registry-backed discovery: listings never walk the tree, stay walk-equivalent, survive churn") {
    import graft.catalog.{IcebergRestService, RestRegistry}
    // a synthetic warehouse, no Spark: namespace markers + hint files
    // are all the discovery surface reads
    val wh = Files.createTempDirectory("graft-rest-reg-")
    def mkNs(levels: String*): Unit = {
      val d = levels.foldLeft(wh)(_.resolve(_))
      Files.createDirectories(d)
      Files.writeString(d.resolve("_namespace.json"), "{}")
    }
    def mkTable(rel: String): Unit = {
      val d = wh.resolve(rel).resolve("metadata")
      Files.createDirectories(d)
      Files.writeString(d.resolve("version-hint.text"), "1")
    }
    mkNs("nsa"); mkNs("nsa", "sub"); mkNs("nsb")
    mkTable("nsa/t1"); mkTable("nsa/t2"); mkTable("nsa/sub/t3")
    mkTable("nsb/t4")

    val h = IcebergRestService.start(wh) // ensure(): ONE walk backfills
    try {
      val reg = RestRegistry.registryFile(wh)
      Files.isRegularFile(reg) shouldBe true
      RestRegistry.readEntries(wh).get shouldBe
        Set("nsa/t1", "nsa/t2", "nsa/sub/t3", "nsb/t4")

      val base = s"${h.uri}/v1"
      def names(body: String, key: String): List[JValue] =
        json(body)(key).asInstanceOf[JArray].arr
      // every LISTING route, zero tree walks (the counter covers all
      // walk paths): before the registry each of these was O(tree),
      // multiplied by pageSize=1 BFS clients
      IcebergRestService.resetWalkCounterForTesting()
      val (nc, nb) = get(s"$base/namespaces")
      nc shouldBe 200
      names(nb, "namespaces").map(_.asInstanceOf[JArray].arr
        .map(_.asInstanceOf[JString].s)) shouldBe
        List(List("nsa"), List("nsb"))
      val (pc, pb) = get(s"$base/namespaces?parent=nsa")
      pc shouldBe 200
      names(pb, "namespaces").map(_.asInstanceOf[JArray].arr
        .map(_.asInstanceOf[JString].s)) shouldBe List(List("nsa", "sub"))
      val (tc, tb) = get(s"$base/namespaces/nsa/tables")
      tc shouldBe 200
      names(tb, "identifiers").map(_.asInstanceOf[JObject].obj.toMap
        .apply("name").asInstanceOf[JString].s) shouldBe List("t1", "t2")
      get(s"$base/namespaces/nsa%1Fsub")._1 shouldBe 200
      get(s"$base/namespaces/no_such")._1 shouldBe 404
      IcebergRestService.walkedDirs.get() shouldBe 0L

      // a new table registering (the commit hook's effect) appears in
      // the next listing via mtime invalidation — still no walk
      mkTable("nsb/t5")
      RestRegistry.maybeRegister(wh.resolve("nsb/t5"))
      val (t2c, t2b) = get(s"$base/namespaces/nsb/tables")
      t2c shouldBe 200
      names(t2b, "identifiers").map(_.asInstanceOf[JObject].obj.toMap
        .apply("name").asInstanceOf[JString].s) shouldBe List("t4", "t5")
      IcebergRestService.walkedDirs.get() shouldBe 0L

      // out-of-band deletion: the stale line is re-validated per PAGE
      // (O(page) stats) — a short page, never a phantom row
      graft.catalog.Fs.deleteRecursively(wh.resolve("nsa/t2"))
      val (t3c, t3b) = get(s"$base/namespaces/nsa/tables")
      t3c shouldBe 200
      names(t3b, "identifiers").map(_.asInstanceOf[JObject].obj.toMap
        .apply("name").asInstanceOf[JString].s) shouldBe List("t1")
      IcebergRestService.walkedDirs.get() shouldBe 0L

      // unregister (dropTable's hook) removes the line for real
      RestRegistry.unregister(wh, "nsa/t2")
      RestRegistry.readEntries(wh).get should not contain "nsa/t2"
      // cascading dropNamespace: prefix removal, separator-anchored —
      // dropping nsa/sub must not touch a sibling named nsa/subx
      mkNs("nsa", "subx"); mkTable("nsa/subx/t9")
      RestRegistry.maybeRegister(wh.resolve("nsa/subx/t9"))
      RestRegistry.unregisterPrefix(wh, "nsa/sub")
      RestRegistry.readEntries(wh).get shouldBe
        Set("nsa/t1", "nsa/subx/t9", "nsb/t4", "nsb/t5")

      // an rm -rf'd NAMESPACE (no catalog hook ran) must not be LISTED
      // only to 404 on its own routes: the namespaces page re-validates
      // each row's directory, same defense the tables page has
      graft.catalog.Fs.deleteRecursively(wh.resolve("nsa"))
      val (n2c, n2b) = get(s"$base/namespaces")
      n2c shouldBe 200
      names(n2b, "namespaces").map(_.asInstanceOf[JArray].arr
        .map(_.asInstanceOf[JString].s)) shouldBe List(List("nsb"))

      // maybeRegister must never CREATE (or replace) a registry: with
      // the file gone, a commit-hook registration is a silent no-op —
      // creation belongs to ensure() alone (a transient empty read
      // writing one line would silently replace a 10k-line registry)
      Files.delete(reg)
      RestRegistry.maybeRegister(wh.resolve("nsb/t4"))
      Files.exists(reg) shouldBe false
      // ...and because the skip was NOT cached as success, the same
      // table registers fine once the registry is healthy again
      IcebergRestService.resetWalkCounterForTesting()
      get(s"$base/namespaces/nsb/tables")._1 shouldBe 200 // self-heal walk
      IcebergRestService.walkedDirs.get() should be > 0L
      Files.isRegularFile(reg) shouldBe true
      RestRegistry.readEntries(wh).get should contain("nsb/t4")
      IcebergRestService.resetWalkCounterForTesting()
      get(s"$base/namespaces/nsb/tables")._1 shouldBe 200
      IcebergRestService.walkedDirs.get() shouldBe 0L
    } finally h.stop()
  }

  test("registry climb: warehouseOf finds the root through namespace markers only") {
    import graft.catalog.RestRegistry
    val wh = Files.createTempDirectory("graft-reg-climb-")
    val ns = wh.resolve("a").resolve("b")
    Files.createDirectories(ns.resolve("tbl"))
    Files.writeString(wh.resolve("a").resolve("_namespace.json"), "{}")
    Files.writeString(ns.resolve("_namespace.json"), "{}")
    RestRegistry.warehouseOf(ns.resolve("tbl")) shouldBe
      Some(wh.toAbsolutePath.normalize)
    // a bare temp-dir table (spec fixture shape) has no warehouse:
    // never registers, and the per-commit hook caches that verdict
    val bare = Files.createTempDirectory("graft-bare-").resolve("t")
    Files.createDirectories(bare)
    RestRegistry.warehouseOf(bare) shouldBe None
  }

  test("lifecycle hook: a crashed query path's endpoint closes at application end") {
    import graft.catalog.IcebergRestService
    val wh = Files.createTempDirectory("graft-rest-leak-")
    // simulate the crash shape: start via the procedure's register
    // path, then never reach stop_rest_catalog
    val port = IcebergRestService.register(wh, 0)
    get(s"http://127.0.0.1:$port/v1/config")._1 shouldBe 200
    // the session ends: the listener the procedure installed fires
    IcebergRestService.lifecycleListener.onApplicationEnd(
      org.apache.spark.scheduler.SparkListenerApplicationEnd(0L))
    // port released — nothing answers anymore
    an[Exception] should be thrownBy
      get(s"http://127.0.0.1:$port/v1/config")
    IcebergRestService.stopPort(port) shouldBe false // already gone
  }

  test("independent python reader consumes a table DISCOVERED via REST") {
    val probe = Process(Seq("python3", "-c", "import duckdb"))
      .!(ProcessLogger(_ => (), _ => ()))
    assume(probe == 0, "python3 + duckdb not available in this environment")
    val tool = Paths.get("tools", "check_iceberg.py").toAbsolutePath.toString
    assume(Files.isRegularFile(Paths.get(tool)), s"missing $tool")

    val port = fixture()
    try {
      val expDir = Files.createTempDirectory("graft-rest-exp-").toString
      spark.table("lakehouse.rest_ns.rt")
        .coalesce(1).write.mode("overwrite").parquet(expDir)
      val out = new StringBuilder
      val code = Process(Seq("python3", tool,
        s"http://127.0.0.1:$port/v1/namespaces/rest_ns/tables/rt", expDir))
        .!(ProcessLogger(l => out.append(l).append('\n'),
          l => out.append(l).append('\n')))
      withClue(out.toString) {
        code shouldBe 0
        out.toString should include("MATCH (3 rows")
      }
    } finally {
      spark.sql(s"CALL lakehouse.system.stop_rest_catalog($port)")
      spark.sql("DROP TABLE IF EXISTS lakehouse.rest_ns.rt")
    }
  }
}
