package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** DSv2 streaming SINK: writeStream.toTable into a lakehouse table —
  * per-epoch staged parquet, watermarked atomic publish (exactly-once
  * under replay), complete mode as whole-table replace. */
class StreamingSinkSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("append-mode writeStream.toTable lands watermarked snapshot appends") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.ssink")
    spark.sql("CREATE TABLE lakehouse.ssink.t (k INT, v STRING)")
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Int, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("ssink-ckpt-").toString
    val q = in.toDF().toDF("k", "v").writeStream
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .toTable("lakehouse.ssink.t")
    try {
      in.addData((1, "a"), (2, "b"))
      q.processAllAvailable()
      spark.table("lakehouse.ssink.t").count() shouldBe 2

      in.addData((3, "c"))
      q.processAllAvailable()
      spark.table("lakehouse.ssink.t").orderBy("k").select("k")
        .collect().map(_.getInt(0)) shouldBe Array(1, 2, 3)

      // every epoch is one append commit carrying the (query, epoch)
      // watermark — the replay-idempotence marker
      val ops = spark.sql(
        "SELECT operation FROM lakehouse.ssink.t.history ORDER BY version")
        .collect().map(_.getString(0))
      ops.count(_ == "append") shouldBe 2
      val props = spark.sessionState.catalogManager.catalog("lakehouse")
        .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
        .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
          Array("ssink"), "t"))
        .properties()
      props.keySet().toArray.exists(_.toString.startsWith("graft.txn.stream-")) shouldBe true
    } finally q.stop()
    // batch reads, time travel, and the file metadata table all serve
    // the streamed snapshots like any other commit
    spark.sql("SELECT * FROM lakehouse.ssink.t VERSION AS OF 2").count() shouldBe 2
    spark.sql("DROP TABLE lakehouse.ssink.t")
  }

  test("upsert-mode sink: each micro-batch merge-on-read upserts by key, no rewrites") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.ssink")
    spark.sql("CREATE TABLE lakehouse.ssink.cdc (k INT, v STRING)")
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Int, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("ssink-ups-ckpt-").toString
    val q = in.toDF().toDF("k", "v").writeStream
      .option("checkpointLocation", ckpt)
      .option("graft.upsertKeys", "k")
      .outputMode(OutputMode.Append())
      .toTable("lakehouse.ssink.cdc")
    try {
      in.addData((1, "a"), (2, "b"))
      q.processAllAvailable()
      spark.table("lakehouse.ssink.cdc").count() shouldBe 2
      val filesAfterB1 = spark.sql(
        "SELECT file_path FROM lakehouse.ssink.cdc.files").collect().map(_.getString(0)).toSet

      // batch 2 REPLACES key 2 and adds key 3 — old version dies, no
      // data file rewritten
      in.addData((2, "B"), (3, "c"))
      q.processAllAvailable()
      val rows = spark.table("lakehouse.ssink.cdc").orderBy("k")
        .collect().map(r => (r.getInt(0), r.getString(1)))
      rows shouldBe Array((1, "a"), (2, "B"), (3, "c"))
      val filesAfterB2 = spark.sql(
        "SELECT file_path FROM lakehouse.ssink.cdc.files").collect().map(_.getString(0)).toSet
      (filesAfterB1 -- filesAfterB2) shouldBe empty // strictly additive
      spark.sql("SELECT * FROM lakehouse.ssink.cdc.delete_files").count() shouldBe 2
      spark.sql("SELECT operation FROM lakehouse.ssink.cdc.history ORDER BY version")
        .collect().map(_.getString(0)).count(_ == "mor-upsert") shouldBe 2

      // a key re-inserted in a later batch survives the earlier delete
      in.addData((1, "A2"))
      q.processAllAvailable()
      spark.table("lakehouse.ssink.cdc").where($"k" === 1)
        .collect().map(_.getString(1)) shouldBe Array("A2")
      spark.table("lakehouse.ssink.cdc").count() shouldBe 3
    } finally q.stop()
    // materialization restores join-free scans with the upserted state
    graft.catalog.MergeOnRead.materializeDeletes(spark, "lakehouse", Seq("ssink"), "cdc")
    spark.table("lakehouse.ssink.cdc").count() shouldBe 3
    spark.sql("DROP TABLE lakehouse.ssink.cdc")
  }

  test("upsert sink racing batch appends: every commit lands, keys stay latest") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.ssink")
    spark.sql("CREATE TABLE lakehouse.ssink.race (k INT, v STRING)")
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Int, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("ssink-race-ckpt-").toString
    val q = in.toDF().toDF("k", "v").writeStream
      .option("checkpointLocation", ckpt)
      .option("graft.upsertKeys", "k")
      .outputMode(OutputMode.Append())
      .toTable("lakehouse.ssink.race")
    try {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val batchWriter = Future {
        (0 until 5).foreach { i =>
          Seq((1000 + i, s"batch-$i")).toDF("k", "v")
            .createOrReplaceTempView(s"race_b_$i")
          spark.sql(s"INSERT INTO lakehouse.ssink.race SELECT * FROM race_b_$i")
        }
      }
      (0 until 5).foreach { i =>
        in.addData((1, s"s$i"))
        q.processAllAvailable()
      }
      Await.result(batchWriter, 120.seconds)
      q.processAllAvailable()

      // every batch row landed exactly once; the stream key holds its
      // LATEST value; nothing lost under contention
      val rows = spark.table("lakehouse.ssink.race").collect()
        .map(r => (r.getInt(0), r.getString(1))).toMap
      rows.keySet shouldBe ((1000 until 1005).toSet + 1)
      rows(1) shouldBe "s4"
      (0 until 5).foreach(i => rows(1000 + i) shouldBe s"batch-$i")
      spark.sql(
        "SELECT operation FROM lakehouse.ssink.race.history ORDER BY version")
        .collect().map(_.getString(0)).count(_ == "append") shouldBe 5
    } finally q.stop()
    spark.sql("DROP TABLE lakehouse.ssink.race")
  }

  test("complete-mode aggregation replaces the table each epoch, time-travelable") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.ssink")
    spark.sql("CREATE TABLE lakehouse.ssink.agg (k INT, n BIGINT)")
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Int]
    val ckpt = java.nio.file.Files.createTempDirectory("ssink-ckpt2-").toString
    val q = in.toDF().toDF("k")
      .groupBy($"k").count().toDF("k", "n")
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Complete())
      .toTable("lakehouse.ssink.agg")
    try {
      in.addData(1, 1, 2)
      q.processAllAvailable()
      spark.table("lakehouse.ssink.agg").orderBy("k").collect()
        .map(r => (r.getInt(0), r.getLong(1))) shouldBe Array((1, 2L), (2, 1L))

      in.addData(1, 3)
      q.processAllAvailable()
      // current snapshot = the LATEST aggregate state only
      spark.table("lakehouse.ssink.agg").orderBy("k").collect()
        .map(r => (r.getInt(0), r.getLong(1))) shouldBe
        Array((1, 3L), (2, 1L), (3, 1L))
      // the previous epoch's state is still a time-travelable snapshot
      val prevV = spark.sql(
        "SELECT MAX(version) FROM lakehouse.ssink.agg.history").collect()(0).getInt(0) - 1
      spark.sql(s"SELECT * FROM lakehouse.ssink.agg VERSION AS OF $prevV")
        .count() shouldBe 2
    } finally q.stop()
    spark.sql("DROP TABLE lakehouse.ssink.agg")
  }

  test("round trip: lakehouse source → stream transform → lakehouse sink") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.ssink")
    spark.sql("CREATE TABLE lakehouse.ssink.src (k INT, v STRING)")
    spark.sql("CREATE TABLE lakehouse.ssink.dst (k INT, v STRING)")
    Seq((1, "x"), (2, "y"), (3, "z")).toDF("k", "v")
      .createOrReplaceTempView("ssink_seed")
    spark.sql("INSERT INTO lakehouse.ssink.src SELECT * FROM ssink_seed")
    val ckpt = java.nio.file.Files.createTempDirectory("ssink-ckpt3-").toString
    val q = spark.readStream.table("lakehouse.ssink.src")
      .filter($"k" >= 2)
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .toTable("lakehouse.ssink.dst")
    q.awaitTermination()
    spark.table("lakehouse.ssink.dst").orderBy("k").select("k")
      .collect().map(_.getInt(0)) shouldBe Array(2, 3)
    spark.sql("DROP TABLE lakehouse.ssink.src")
    spark.sql("DROP TABLE lakehouse.ssink.dst")
  }

  test("streaming writes refuse GENERATED ALWAYS identity tables up front") {
    // epoch tasks cannot mint (no commit-scoped sequence range), so
    // streamed rows would land writer-supplied values in a column that
    // accepts only engine-minted ones
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.ssink")
    spark.sql("CREATE TABLE lakehouse.ssink.ida (" +
      "id BIGINT GENERATED ALWAYS AS IDENTITY, v STRING)")
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("ssink-ida-ckpt-").toString
    val q = in.toDF().toDF("id", "v").writeStream
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .toTable("lakehouse.ssink.ida")
    try {
      in.addData((1L, "a"))
      val e = intercept[Exception] { q.processAllAvailable() }
      def chain(t: Throwable): Seq[String] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(
          c => Option(c.getMessage).getOrElse("")).toSeq
      chain(e).exists(_.contains("GENERATED ALWAYS")) shouldBe true
      spark.table("lakehouse.ssink.ida").count() shouldBe 0
    } finally q.stop()
    spark.sql("DROP TABLE lakehouse.ssink.ida")
  }

  test("streaming BY DEFAULT identity values advance the mark; later mints never collide") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.ssink")
    spark.sql("CREATE TABLE lakehouse.ssink.idd (" +
      "id BIGINT GENERATED BY DEFAULT AS IDENTITY, v STRING)")
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("ssink-idd-ckpt-").toString
    val q = in.toDF().toDF("id", "v").writeStream
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .toTable("lakehouse.ssink.idd")
    try {
      in.addData((100L, "a"), (101L, "b"))
      q.processAllAvailable()
    } finally q.stop()
    import spark.implicits._
    Seq("c").toDF("v").createOrReplaceTempView("idd_src")
    spark.sql("INSERT INTO lakehouse.ssink.idd SELECT CAST(NULL AS BIGINT), v FROM idd_src")
    val ids = spark.table("lakehouse.ssink.idd").select($"id").as[Long].collect().toSeq
    ids.distinct.length shouldBe ids.length
    spark.table("lakehouse.ssink.idd").where($"v" === "c").select($"id")
      .as[Long].collect()(0) should be > 101L
    spark.sql("DROP TABLE lakehouse.ssink.idd")
  }

  test("a WAP session refuses streaming epochs instead of publishing to main") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.ssink")
    spark.sql("CREATE TABLE lakehouse.ssink.wapt (k INT, v STRING)")
    spark.sql("CALL lakehouse.system.branch('ssink', 'wapt', 'audit')")
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Int, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("ssink-wap-ckpt-").toString
    spark.conf.set("graft.wap.branch", "audit")
    try {
      val q = in.toDF().toDF("k", "v").writeStream
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append())
        .toTable("lakehouse.ssink.wapt")
      try {
        in.addData((1, "a"))
        val e = intercept[Exception] { q.processAllAvailable() }
        def chain(t: Throwable): Seq[String] =
          Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(
            c => Option(c.getMessage).getOrElse("")).toSeq
        chain(e).exists(_.contains("graft.wap.branch")) shouldBe true
      } finally q.stop()
      // nothing landed on main OR the branch
      spark.table("lakehouse.ssink.wapt").count() shouldBe 0
    } finally spark.conf.unset("graft.wap.branch")
    spark.sql("DROP TABLE lakehouse.ssink.wapt")
  }
}
