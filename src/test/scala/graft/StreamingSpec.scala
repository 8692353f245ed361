package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.streaming.{Event, EventStreams}

class StreamingSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("watermarked tumbling window aggregation over a stream") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.hourlyTypeCounts(in.toDF())
      .writeStream.format("memory").queryName("hourly").outputMode(OutputMode.Update()).start()
    try {
      in.addData(
        Event(1, ts(5), 1, "click", 1.0),
        Event(2, ts(20), 2, "click", 2.0),
        Event(3, ts(40), 1, "view", 3.0))
      q.processAllAvailable()
      val rows = spark.table("hourly").collect()
        .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("cnt"), r.getAs[Double]("sum_value")))
        .toSet
      rows should contain(("click", 2L, 3.0))
      rows should contain(("view", 1L, 3.0))
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization closes sessions on gap") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.sessionize(in.toDS(), gapMs = 10 * 60 * 1000)
      .writeStream.format("memory").queryName("sessions").outputMode(OutputMode.Append()).start()
    try {
      // user 1: two events 5min apart (one session), then a 30min gap
      // breaks it mid-batch when the third event arrives
      in.addData(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(5), 1, "click", 2.0))
      q.processAllAvailable()
      in.addData(Event(3, ts(35), 1, "click", 4.0))
      q.processAllAvailable()
      val sessions = spark.table("sessions").as[graft.streaming.SessionSummary].collect()
      sessions should have length 1 // first session closed by the gap
      sessions.head.n_events shouldBe 2
      sessions.head.total_value shouldBe 3.0
      sessions.head.session_start shouldBe ts(0)
      sessions.head.session_end shouldBe ts(5)
    } finally q.stop()
  }

  test("sessionize extends session_start backward for a late within-watermark event") {
    // a late event PRECEDING the stored session start must move the
    // start back (min), not be silently absorbed — a batch replay of
    // the same data would report the earlier start
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.sessionize(in.toDS(), gapMs = 10 * 60 * 1000)
      .writeStream.format("memory").queryName("sessions_late")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(Event(1, ts(5), 1, "click", 1.0))
      q.processAllAvailable()
      // watermark = max(ts) - 10min = ts(-5), so ts(2) is late but live
      in.addData(Event(2, ts(2), 1, "click", 2.0))
      q.processAllAvailable()
      // a 30-minute jump closes the session
      in.addData(Event(3, ts(40), 1, "click", 4.0))
      q.processAllAvailable()
      val sessions = spark.table("sessions_late")
        .as[graft.streaming.SessionSummary].collect()
      sessions should have length 1
      sessions.head.n_events shouldBe 2
      sessions.head.session_start shouldBe ts(2) // min, not first-seen
      sessions.head.session_end shouldBe ts(5)
    } finally q.stop()
  }

  test("stream-stream join pairs clicks with preceding views per user") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.clicksAfterViews(in.toDF())
      .writeStream.format("memory").queryName("cv").outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        Event(1, ts(0), 7, "view", 0.0),
        Event(2, ts(10), 7, "click", 0.0),  // pairs with view 1
        Event(3, ts(20), 8, "click", 0.0),  // other user: no view → no pair
        Event(4, ts(30), 7, "click", 0.0))  // also pairs with view 1
      q.processAllAvailable()
      val pairs = spark.table("cv").collect()
        .map(r => (r.getAs[Long]("view_id"), r.getAs[Long]("click_id"))).toSet
      pairs shouldBe Set((1L, 2L), (1L, 4L))
    } finally q.stop()
  }

  test("streaming dedup suppresses repeated keys within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.dedupStream(in.toDF(), Seq("event_id"))
      .writeStream.format("memory").queryName("deduped").outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(1, ts(1), 1, "click", 1.0), // duplicate id within watermark
        Event(2, ts(2), 2, "view", 2.0))
      q.processAllAvailable()
      in.addData(Event(2, ts(3), 2, "view", 2.0)) // late duplicate
      q.processAllAvailable()
      val ids = spark.table("deduped").collect().map(_.getAs[Long]("event_id")).sorted
      ids.toSeq shouldBe Seq(1L, 2L)
    } finally q.stop()
  }

  test("stream-static enrichment joins each micro-batch against a dim table") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.stream_ns")
    spark.sql("CREATE TABLE lakehouse.stream_ns.users (user_id BIGINT, tier STRING)")
    Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
      .createOrReplaceTempView("users_src")
    spark.sql("INSERT INTO lakehouse.stream_ns.users SELECT * FROM users_src")

    val dim = spark.table("lakehouse.stream_ns.users")
    val q = EventStreams.enrich(in.toDF(), dim, Seq("user_id"))
      .writeStream.format("memory").queryName("enriched").outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        Event(1, ts(5), 1, "click", 1.0),
        Event(2, ts(6), 2, "click", 2.0),
        Event(3, ts(7), 9, "click", 3.0)) // no dim row → tier NULL, row kept
      q.processAllAvailable()
      val rows = spark.table("enriched")
        .select($"event_id", $"tier").orderBy($"event_id").collect()
      rows.map(r => r.getLong(0) -> Option(r.getString(1))).toSeq shouldBe
        Seq(1L -> Some("gold"), 2L -> Some("basic"), 3L -> None)
    } finally q.stop()
    spark.sql("DROP TABLE lakehouse.stream_ns.users")
  }

  test("streaming upsert applies latest-by-key CDC batches to a lakehouse table") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.stream_ns")
    spark.sql("""CREATE TABLE lakehouse.stream_ns.state
      (event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE)""")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-upsert-ckpt").toString
    val q = EventStreams.upsertToLakehouse(in.toDF(), "lakehouse", Seq("stream_ns"),
      "state", keyCols = Seq("user_id"), orderCol = "ts", checkpointDir = ckpt)
    try {
      // batch 1: two users, user 1 appears twice out of order → latest wins
      in.addData(
        Event(1, ts(10), 1, "click", 10.0),
        Event(2, ts(5), 1, "view", 5.0),
        Event(3, ts(6), 2, "view", 6.0))
      q.processAllAvailable()
      val s1 = spark.table("lakehouse.stream_ns.state")
        .orderBy($"user_id").collect().map(r => (r.getLong(2), r.getDouble(4)))
      s1.toSeq shouldBe Seq((1L, 10.0), (2L, 6.0))

      // batch 2: user 2 updated, user 3 new, user 1 untouched
      in.addData(Event(4, ts(20), 2, "purchase", 99.0), Event(5, ts(21), 3, "signup", 1.0))
      q.processAllAvailable()
      val s2 = spark.table("lakehouse.stream_ns.state")
        .orderBy($"user_id").collect().map(r => (r.getLong(2), r.getDouble(4)))
      s2.toSeq shouldBe Seq((1L, 10.0), (2L, 99.0), (3L, 1.0))
      // each applied batch is one snapshot: history shows merge commits
      spark.sql("SELECT operation FROM lakehouse.stream_ns.state.history ORDER BY version")
        .collect().map(_.getString(0)).count(_ == "merge") shouldBe 2
    } finally q.stop()
    spark.sql("DROP TABLE lakehouse.stream_ns.state")
  }

  test("streaming file ingest appends micro-batch snapshots to a lakehouse table") {
    val src = java.nio.file.Files.createTempDirectory("stream-src-").toString
    val ckpt = java.nio.file.Files.createTempDirectory("stream-ckpt-").toString
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.stream_ns")
    spark.sql("CREATE TABLE lakehouse.stream_ns.ingested (a BIGINT, b STRING)")
    val df1 = Seq((1L, "x"), (2L, "y")).toDF("a", "b")
    df1.write.parquet(s"$src/batch1")
    val q = EventStreams.ingestToLakehouse(spark, s"$src/*", df1.schema,
      "lakehouse.stream_ns.ingested", ckpt)
    try {
      q.processAllAvailable()
      spark.table("lakehouse.stream_ns.ingested").count() shouldBe 2
      Seq((3L, "z")).toDF("a", "b").write.parquet(s"$src/batch2")
      q.processAllAvailable()
      spark.table("lakehouse.stream_ns.ingested").count() shouldBe 3
      // each micro-batch is one committed snapshot
      val ops = spark.sql("SELECT * FROM lakehouse.stream_ns.ingested.history ORDER BY version")
        .collect().map(_.getAs[String]("operation")).toSeq
      ops.count(_ == "append") shouldBe 2
    } finally {
      q.stop()
      spark.sql("DROP TABLE lakehouse.stream_ns.ingested")
    }
  }

  test("lakehouse table is a streaming source: appends arrive as micro-batches") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.stream_ns")
    spark.sql("CREATE TABLE lakehouse.stream_ns.feed (a BIGINT, b STRING)")
    Seq((1L, "x"), (2L, "y")).toDF("a", "b").createOrReplaceTempView("feed_src1")
    spark.sql("INSERT INTO lakehouse.stream_ns.feed SELECT * FROM feed_src1")

    val q = spark.readStream
      .table("lakehouse.stream_ns.feed")
      .writeStream.format("memory").queryName("feed_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("feed-ckpt-").toString)
      .start()
    try {
      q.processAllAvailable()
      spark.table("feed_out").count() shouldBe 2 // existing data = first batch

      Seq((3L, "z")).toDF("a", "b").createOrReplaceTempView("feed_src2")
      spark.sql("INSERT INTO lakehouse.stream_ns.feed SELECT * FROM feed_src2")
      q.processAllAvailable()
      spark.table("feed_out").orderBy($"a").as[(Long, String)].collect().toSeq shouldBe
        Seq((1L, "x"), (2L, "y"), (3L, "z")) // only the delta re-read, no duplicates
    } finally {
      q.stop()
      spark.sql("DROP TABLE lakehouse.stream_ns.feed")
    }
  }

  test(".changes stream reads through upsert commits with net-change semantics") {
    // the round-6 composition failure: a table fed by the CDC upsert
    // sink killed any plain stream reading it (delete entries every
    // epoch). The `.changes` face consumes it as +/- rows instead.
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.stream_ns")
    spark.sql("CREATE TABLE lakehouse.stream_ns.cdc_t (k INT, v STRING)")
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Int, String)]
    val up = in.toDF().toDF("k", "v").writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("cdc-up-ckpt-").toString)
      .option("graft.upsertKeys", "k")
      .outputMode(OutputMode.Append())
      .toTable("lakehouse.stream_ns.cdc_t")
    val down = spark.readStream
      .table("lakehouse.stream_ns.cdc_t.changes")
      .writeStream.format("memory").queryName("cdc_changes")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("cdc-down-ckpt-").toString)
      .start()
    try {
      in.addData((1, "a"), (2, "b"))
      up.processAllAvailable()
      down.processAllAvailable()
      spark.table("cdc_changes")
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet shouldBe
        Set((1, "a", "insert"), (2, "b", "insert"))

      // upstream batch 2 replaces key 2 and adds key 3: the downstream
      // stream must see the retraction AND the new versions, not die
      in.addData((2, "B"), (3, "c"))
      up.processAllAvailable()
      down.processAllAvailable()
      val late = spark.table("cdc_changes")
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
      late shouldBe Set(
        (1, "a", "insert"), (2, "b", "insert"),
        (2, "b", "delete"), (2, "B", "insert"), (3, "c", "insert"))
      // applying the +/- stream reproduces the table's current state
      val net = spark.table("cdc_changes").groupBy($"k", $"v")
        .agg((org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.when($"_change_type" === "insert", 1)
            .otherwise(-1))).as("n"))
        .where($"n" > 0).select($"k", $"v")
        .collect().map(r => (r.getInt(0), r.getString(1))).toSet
      net shouldBe spark.table("lakehouse.stream_ns.cdc_t")
        .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    } finally {
      up.stop(); down.stop()
      spark.sql("DROP TABLE lakehouse.stream_ns.cdc_t")
    }
  }

  test(".changes stream replays history from startingVersion and respects rate limits") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.stream_ns")
    spark.sql("CREATE TABLE lakehouse.stream_ns.cdc_h (k INT, v STRING)")
    (1 to 3).foreach { i =>
      Seq((i, s"v$i")).toDF("k", "v").createOrReplaceTempView(s"cdc_h_src$i")
      spark.sql(s"INSERT INTO lakehouse.stream_ns.cdc_h SELECT * FROM cdc_h_src$i")
    }
    spark.sql("DELETE FROM lakehouse.stream_ns.cdc_h WHERE k = 2") // COW delete
    val q = spark.readStream
      .option("maxVersionsPerTrigger", "1") // one commit per micro-batch
      .table("lakehouse.stream_ns.cdc_h.changes")
      .writeStream.format("memory").queryName("cdc_hist")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("cdc-hist-ckpt-").toString)
      .start()
    try {
      q.processAllAvailable()
      val rows = spark.table("cdc_hist")
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
      rows shouldBe Set(
        (1, "v1", "insert"), (2, "v2", "insert"), (3, "v3", "insert"),
        (2, "v2", "delete"))
      // one micro-batch per commit: distinct _commit_version per batch
      spark.table("cdc_hist").select($"_commit_version").distinct().count() shouldBe 4
    } finally {
      q.stop()
      spark.sql("DROP TABLE lakehouse.stream_ns.cdc_h")
    }
  }

  test(".changes stream refuses to span a schema change, works from the new epoch") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.stream_ns")
    spark.sql("CREATE TABLE lakehouse.stream_ns.cdc_ddl (k INT, v STRING)")
    Seq((1, "a")).toDF("k", "v").createOrReplaceTempView("cdc_ddl_1")
    spark.sql("INSERT INTO lakehouse.stream_ns.cdc_ddl SELECT * FROM cdc_ddl_1")
    spark.sql("ALTER TABLE lakehouse.stream_ns.cdc_ddl ADD COLUMN extra BIGINT")
    val ddlV = spark.sql("SELECT MAX(version) FROM lakehouse.stream_ns.cdc_ddl.history")
      .collect()(0).getInt(0)
    Seq((2, "b", 7L)).toDF("k", "v", "extra").createOrReplaceTempView("cdc_ddl_2")
    spark.sql("INSERT INTO lakehouse.stream_ns.cdc_ddl SELECT * FROM cdc_ddl_2")

    // default start (full history) would wedge on the DDL: fail at start
    val bad = spark.readStream.table("lakehouse.stream_ns.cdc_ddl.changes")
      .writeStream.format("memory").queryName("cdc_ddl_bad")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("cdc-ddl-bad-").toString)
      .start()
    val e = intercept[Exception] { bad.processAllAvailable() }
    e.getMessage should include("schema changed")
    bad.stop()

    // starting at the new epoch streams cleanly
    val ok = spark.readStream.option("startingVersion", ddlV.toString)
      .table("lakehouse.stream_ns.cdc_ddl.changes")
      .writeStream.format("memory").queryName("cdc_ddl_ok")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("cdc-ddl-ok-").toString)
      .start()
    try {
      ok.processAllAvailable()
      val rows = spark.table("cdc_ddl_ok").collect()
      rows should have length 1
      rows.head.getInt(0) shouldBe 2
      rows.head.getString(3) shouldBe "insert"
    } finally {
      ok.stop()
      spark.sql("DROP TABLE lakehouse.stream_ns.cdc_ddl")
    }
  }

  test(".changes restart from a checkpoint predating a DDL fails actionably, not wedging") {
    // restart skips initialOffset, so the guard must also run at plan
    // time: a stream checkpointed before an ALTER used to wedge in the
    // stage-window retry loop on restart
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.stream_ns")
    spark.sql("CREATE TABLE lakehouse.stream_ns.cdc_restart (k INT, v STRING)")
    val ckpt = java.nio.file.Files.createTempDirectory("cdc-restart-ckpt-").toString
    val out = java.nio.file.Files.createTempDirectory("cdc-restart-out-").toString
    Seq((1, "a")).toDF("k", "v").createOrReplaceTempView("cdc_re_1")
    spark.sql("INSERT INTO lakehouse.stream_ns.cdc_restart SELECT * FROM cdc_re_1")
    val q1 = spark.readStream.table("lakehouse.stream_ns.cdc_restart.changes")
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()
    q1.processAllAvailable()
    q1.stop()

    // an UNCONSUMED pre-DDL commit makes the restart window genuinely
    // span the schema change (old-epoch commit + DDL + new-epoch commit)
    Seq((9, "z")).toDF("k", "v").createOrReplaceTempView("cdc_re_old")
    spark.sql("INSERT INTO lakehouse.stream_ns.cdc_restart SELECT * FROM cdc_re_old")
    spark.sql("ALTER TABLE lakehouse.stream_ns.cdc_restart ADD COLUMN extra BIGINT")
    Seq((2, "b", 7L)).toDF("k", "v", "extra").createOrReplaceTempView("cdc_re_2")
    spark.sql("INSERT INTO lakehouse.stream_ns.cdc_restart SELECT * FROM cdc_re_2")

    val q2 = spark.readStream.table("lakehouse.stream_ns.cdc_restart.changes")
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()
    try {
      val e = intercept[Exception] { q2.processAllAvailable() }
      e.getMessage should include("schema changed")
      e.getMessage should include("spanSchemaChanges")
    } finally {
      q2.stop()
      spark.sql("DROP TABLE lakehouse.stream_ns.cdc_restart")
    }
  }

  test(".changes stream spans an ADD COLUMN commit under spanSchemaChanges") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.stream_ns")
    spark.sql("CREATE TABLE lakehouse.stream_ns.cdc_span (k INT, v STRING)")
    Seq((1, "a")).toDF("k", "v").createOrReplaceTempView("cdc_span_1")
    spark.sql("INSERT INTO lakehouse.stream_ns.cdc_span SELECT * FROM cdc_span_1")
    spark.sql("ALTER TABLE lakehouse.stream_ns.cdc_span ADD COLUMN extra BIGINT")
    Seq((2, "b", 7L)).toDF("k", "v", "extra").createOrReplaceTempView("cdc_span_2")
    spark.sql("INSERT INTO lakehouse.stream_ns.cdc_span SELECT * FROM cdc_span_2")

    // full-history replay ACROSS the DDL: pre-DDL epochs project to
    // the request-time schema, the added column reading as null
    val q = spark.readStream.option("spanSchemaChanges", "true")
      .table("lakehouse.stream_ns.cdc_span.changes")
      .writeStream.format("memory").queryName("cdc_span_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("cdc-span-ckpt-").toString)
      .start()
    try {
      q.processAllAvailable()
      val rows = spark.table("cdc_span_out")
        .collect().map(r => (r.getInt(0), r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getString(3))).toSet
      rows shouldBe Set(
        (1, "a", None, "insert"),
        (2, "b", Some(7L), "insert"))

      // post-DDL commits keep flowing through the same stream
      Seq((3, "c", 9L)).toDF("k", "v", "extra").createOrReplaceTempView("cdc_span_3")
      spark.sql("INSERT INTO lakehouse.stream_ns.cdc_span SELECT * FROM cdc_span_3")
      q.processAllAvailable()
      spark.table("cdc_span_out").count() shouldBe 3
    } finally {
      q.stop()
      spark.sql("DROP TABLE lakehouse.stream_ns.cdc_span")
    }
  }

  test("Trigger.AvailableNow drains existing snapshots then stops") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.stream_ns")
    spark.sql("CREATE TABLE lakehouse.stream_ns.drain (a BIGINT, b STRING)")
    Seq((1L, "x"), (2L, "y")).toDF("a", "b").createOrReplaceTempView("drain_src")
    spark.sql("INSERT INTO lakehouse.stream_ns.drain SELECT * FROM drain_src")
    spark.sql("INSERT INTO lakehouse.stream_ns.drain SELECT a + 10, b FROM drain_src")

    val q = spark.readStream
      .table("lakehouse.stream_ns.drain")
      .writeStream.format("memory").queryName("drain_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("drain-ckpt-").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(60000) shouldBe true // drains both snapshots, then stops
      spark.table("drain_out").count() shouldBe 4
    } finally {
      q.stop()
      spark.sql("DROP TABLE lakehouse.stream_ns.drain")
    }
  }

  test("table-to-table replication: stream source feeds a lakehouse sink incrementally") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.stream_ns")
    spark.sql("CREATE TABLE lakehouse.stream_ns.src_t (a BIGINT, b STRING)")
    spark.sql("CREATE TABLE lakehouse.stream_ns.dst_t (a BIGINT, b STRING)")
    Seq((1L, "x"), (2L, "y")).toDF("a", "b").createOrReplaceTempView("rep_src")
    spark.sql("INSERT INTO lakehouse.stream_ns.src_t SELECT * FROM rep_src")

    val q = spark.readStream
      .table("lakehouse.stream_ns.src_t")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.writeTo("lakehouse.stream_ns.dst_t").append()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("rep-ckpt-").toString)
      .start()
    try {
      q.processAllAvailable()
      spark.table("lakehouse.stream_ns.dst_t").count() shouldBe 2

      spark.sql("INSERT INTO lakehouse.stream_ns.src_t SELECT a + 10, b FROM rep_src")
      q.processAllAvailable()
      // destination caught up incrementally — one append per micro-batch,
      // no reprocessing of already-replicated snapshots
      spark.table("lakehouse.stream_ns.dst_t").orderBy($"a")
        .as[(Long, String)].collect().toSeq shouldBe
        Seq((1L, "x"), (2L, "y"), (11L, "x"), (12L, "y"))
      spark.sql("SELECT operation FROM lakehouse.stream_ns.dst_t.history")
        .collect().map(_.getString(0)).count(_ == "append") shouldBe 2
    } finally {
      q.stop()
      spark.sql("DROP TABLE lakehouse.stream_ns.src_t")
      spark.sql("DROP TABLE lakehouse.stream_ns.dst_t")
    }
  }

  test("streaming source fails cleanly on rewrite commits instead of double-counting") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.stream_ns")
    spark.sql("CREATE TABLE lakehouse.stream_ns.rw (a BIGINT, b STRING)")
    Seq((1L, "x"), (2L, "y")).toDF("a", "b").createOrReplaceTempView("rw_src")
    spark.sql("INSERT INTO lakehouse.stream_ns.rw SELECT * FROM rw_src")

    val q = spark.readStream
      .table("lakehouse.stream_ns.rw")
      .writeStream.format("memory").queryName("rw_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("rw-ckpt-").toString)
      .start()
    try {
      q.processAllAvailable()
      spark.table("rw_out").count() shouldBe 2

      // a COW delete re-adds surviving rows as a new file — the
      // added-file diff would replay row (2,'y'), so the stream must fail
      spark.sql("DELETE FROM lakehouse.stream_ns.rw WHERE a = 1")
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      ex.getMessage should include("non-append")
    } finally {
      q.stop()
      spark.sql("DROP TABLE lakehouse.stream_ns.rw")
    }
  }

  test("streams survive a metadata-only entry-drop commit (dead-delete materialization)") {
    // A mor-delete whose keys match no file publishes an entry that
    // stats prove dead everywhere; materialize_deletes then drops it in
    // a METADATA-ONLY commit (no file, no row changed). The stream
    // guard used to fail on ANY delete-entry-set change, killing every
    // running stream over the table for a no-op commit.
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.stream_ns")
    spark.sql("CREATE TABLE lakehouse.stream_ns.edrop (a BIGINT, b STRING)")
    Seq((1L, "x"), (2L, "y")).toDF("a", "b").createOrReplaceTempView("edrop_src")
    spark.sql("INSERT INTO lakehouse.stream_ns.edrop SELECT * FROM edrop_src")
    // dead entry: key far outside every file's range
    graft.catalog.MergeOnRead.morDelete(spark, "lakehouse", Seq("stream_ns"), "edrop",
      Seq(99999L).toDF("a"))
    val startV = spark.sql("SELECT MAX(version) FROM lakehouse.stream_ns.edrop.history")
      .collect()(0).getInt(0)

    val q = spark.readStream
      .option("startingVersion", startV.toString)
      .table("lakehouse.stream_ns.edrop")
      .writeStream.format("memory").queryName("edrop_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("edrop-ckpt-").toString)
      .start()
    try {
      q.processAllAvailable()
      // the entry-drop commit (returns 0: no file rewritten)
      graft.catalog.MergeOnRead.materializeDeletes(
        spark, "lakehouse", Seq("stream_ns"), "edrop") shouldBe 0
      spark.sql("INSERT INTO lakehouse.stream_ns.edrop SELECT a + 10, b FROM edrop_src")
      q.processAllAvailable() // must NOT throw on the entry-drop commit
      spark.table("edrop_out").count() shouldBe 2 // the post-drop append only
    } finally {
      q.stop()
      spark.sql("DROP TABLE lakehouse.stream_ns.edrop")
    }
  }

  test("transactionalAppend skips replayed batches: exactly-once under re-execution") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.stream_ns")
    spark.sql("CREATE TABLE lakehouse.stream_ns.txn_t (a BIGINT, b STRING)")
    val m = graft.catalog.Maintenance
    def cnt = spark.table("lakehouse.stream_ns.txn_t").count()

    val b0 = Seq((1L, "x"), (2L, "y")).toDF("a", "b")
    m.transactionalAppend(spark, "lakehouse", Seq("stream_ns"), "txn_t",
      b0, "ckpt1", 0L) shouldBe true
    cnt shouldBe 2
    // the crash-replay: same txn, same batch → recognized and skipped
    m.transactionalAppend(spark, "lakehouse", Seq("stream_ns"), "txn_t",
      b0, "ckpt1", 0L) shouldBe false
    cnt shouldBe 2
    // next batch applies; an older batch id replayed late is also skipped
    m.transactionalAppend(spark, "lakehouse", Seq("stream_ns"), "txn_t",
      Seq((3L, "z")).toDF("a", "b"), "ckpt1", 1L) shouldBe true
    cnt shouldBe 3
    m.transactionalAppend(spark, "lakehouse", Seq("stream_ns"), "txn_t",
      b0, "ckpt1", 0L) shouldBe false
    cnt shouldBe 3
    // a DIFFERENT checkpoint identity is its own watermark
    m.transactionalAppend(spark, "lakehouse", Seq("stream_ns"), "txn_t",
      Seq((9L, "w")).toDF("a", "b"), "ckpt2", 0L) shouldBe true
    cnt shouldBe 4
    spark.sql("DROP TABLE lakehouse.stream_ns.txn_t")
  }

  test("exactly-once streaming ingest lands every batch exactly once") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.stream_ns")
    spark.sql("CREATE TABLE lakehouse.stream_ns.eo_t (a BIGINT, b STRING)")
    val srcDir = java.nio.file.Files.createTempDirectory("eo-src-").toString
    val ckpt = java.nio.file.Files.createTempDirectory("eo-ckpt-").toString
    val schema = spark.table("lakehouse.stream_ns.eo_t").schema
    Seq((1L, "x"), (2L, "y")).toDF("a", "b").write.mode("append").parquet(srcDir)
    val q = graft.streaming.EventStreams.ingestToLakehouseExactlyOnce(
      spark, srcDir, schema, "lakehouse", Seq("stream_ns"), "eo_t", ckpt)
    try {
      q.processAllAvailable()
      spark.table("lakehouse.stream_ns.eo_t").count() shouldBe 2
      Seq((3L, "z")).toDF("a", "b").write.mode("append").parquet(srcDir)
      q.processAllAvailable()
      spark.table("lakehouse.stream_ns.eo_t").orderBy($"a").as[(Long, String)]
        .collect().toSeq shouldBe Seq((1L, "x"), (2L, "y"), (3L, "z"))
    } finally {
      q.stop()
      spark.sql("DROP TABLE lakehouse.stream_ns.eo_t")
    }
  }

  test("maxVersionsPerTrigger bounds each micro-batch during backfill") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.stream_ns")
    spark.sql("CREATE TABLE lakehouse.stream_ns.bf (a BIGINT)")
    (1 to 5).foreach { i =>
      Seq(i.toLong).toDF("a").createOrReplaceTempView("bf_src")
      spark.sql("INSERT INTO lakehouse.stream_ns.bf SELECT * FROM bf_src")
    }
    // 6 versions (create + 5 inserts); cap at 2 versions per batch →
    // the AvailableNow backfill needs ≥3 batches instead of one
    val q = spark.readStream
      .option("maxVersionsPerTrigger", "2")
      .table("lakehouse.stream_ns.bf")
      .writeStream.format("memory").queryName("bf_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("bf-ckpt-").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(60000) shouldBe true
      spark.table("bf_out").orderBy($"a").as[Long].collect().toSeq shouldBe
        Seq(1L, 2L, 3L, 4L, 5L) // complete, exactly once
      val batches = q.recentProgress.count(_.numInputRows > 0)
      batches should be >= 3 // rate limit actually split the backfill
    } finally {
      q.stop()
      spark.sql("DROP TABLE lakehouse.stream_ns.bf")
    }
  }
}
