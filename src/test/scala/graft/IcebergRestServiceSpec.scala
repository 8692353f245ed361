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
      get(s"$base/namespaces/%2e%2e/tables")._1 shouldBe 404

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
    } finally {
      spark.sql(s"CALL lakehouse.system.stop_rest_catalog($port)")
        .collect()(0).getLong(0) shouldBe 1L
    }
    // stopped: the port no longer answers
    an[Exception] should be thrownBy get(s"http://127.0.0.1:$port/v1/config")
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
