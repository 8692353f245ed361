package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.multimodal.{MediaOps, StubCodec}

class MediaSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def payload(w: Int, h: Int, fill: Byte*): Array[Byte] =
    Array[Byte](w.toByte, h.toByte) ++ fill

  test("decodeFeatures: schema, determinism, batch plumbing") {
    val media = Seq(
      (1L, payload(16, 8, 1, 2, 3)),
      (2L, payload(32, 32, 9)),
      (3L, payload(4, 4))).toDF("id", "payload")
    val feats = MediaOps.decodeFeatures(media, StubCodec, targetW = 4, targetH = 4)
    feats.schema.fieldNames.toSeq shouldBe Seq("id", "width", "height", "features")
    val rows = feats.collect().sortBy(_.id)
    rows.map(r => (r.id, r.width, r.height)).toSeq shouldBe
      Seq((1L, 16, 8), (2L, 32, 32), (3L, 4, 4))
    all(rows.map(_.features.length)) shouldBe 4 * 4 * 3
    all(rows.flatMap(_.features)) should (be >= 0.0f and be < 1.0f)
    // deterministic: same input → identical features
    val again = MediaOps.decodeFeatures(media, StubCodec, 4, 4).collect().sortBy(_.id)
    again.map(_.features.toSeq) shouldBe rows.map(_.features.toSeq)
  }

  test("decodeFeatures output joins into the similarity path") {
    val media = (1L to 10L).map(i => (i, payload(8, 8, i.toByte))).toDF("id", "payload")
    val emb = MediaOps.withEmbedding(MediaOps.decodeFeatures(media, StubCodec, 2, 2))
    emb.schema.fieldNames.toSeq shouldBe Seq("vec_id", "embedding")
    graft.functions.GraftFunctions.register(spark)
    val sims = emb.as("a").crossJoin(emb.as("b"))
      .selectExpr("a.vec_id", "b.vec_id",
        "vec_dot(a.embedding, b.embedding) / sqrt(vec_norm_sq(a.embedding) * vec_norm_sq(b.embedding)) AS sim")
      .collect()
    sims.length shouldBe 100
    // self-similarity is exactly 1 up to fp rounding
    sims.filter(r => r.getLong(0) == r.getLong(1))
      .foreach(r => r.getDouble(2) shouldBe 1.0 +- 1e-9)
  }

  test("sampleFrames: every-Nth frame, correct slicing") {
    val frame = (idx: Int) => Array.fill(4)(idx.toByte)
    val video = (0 until 10).flatMap(i => frame(i).toSeq).toArray
    val df = Seq((7L, video)).toDF("id", "payload")
    val frames = MediaOps.sampleFrames(df, frameBytes = 4, stride = 3).collect().sortBy(_.frame_idx)
    frames.map(_.frame_idx).toSeq shouldBe Seq(0, 3, 6, 9)
    frames.foreach(f => f.payload.toSeq shouldBe Seq.fill(4)(f.frame_idx.toByte))
  }

  test("multimodal round-trip through a lakehouse table feeds decodeFeatures") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.media_ns")
    spark.sql("CREATE TABLE lakehouse.media_ns.imgs (id BIGINT, payload BINARY)")
    Seq((1L, payload(8, 4, 5, 5))).toDF("id", "payload")
      .createOrReplaceTempView("imgs_src")
    spark.sql("INSERT INTO lakehouse.media_ns.imgs SELECT * FROM imgs_src")
    val feats = MediaOps.decodeFeatures(spark.table("lakehouse.media_ns.imgs")).collect()
    feats.map(f => (f.id, f.width, f.height)).toSeq shouldBe Seq((1L, 8, 4))
    spark.sql("DROP TABLE lakehouse.media_ns.imgs")
  }

  test("perceptual hash pairs identical payloads, separates distinct ones") {
    // ids 1 and 2 share a payload byte-for-byte → identical phash,
    // hamming 0; id 3 differs
    val media = Seq(
      (1L, payload(16, 8, 1, 2, 3)),
      (2L, payload(16, 8, 1, 2, 3)),
      (3L, payload(16, 8, 9, 9, 9, 9, 9))).toDF("id", "payload")
    val hashes = MediaOps.perceptualHash(media, StubCodec)
    hashes.schema.fieldNames.toSeq shouldBe Seq("id", "phash")
    val byId = hashes.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byId(1L) shouldBe byId(2L)
    // deterministic across runs
    MediaOps.perceptualHash(media, StubCodec).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe byId

    val pairs = MediaOps.nearDupMedia(hashes).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    pairs should contain((1L, 2L, 0)) // the duplicate pair, hamming 0
    // no pair may exceed the guaranteed-recall threshold
    all(pairs.map(_._3)) should be <= 3
  }
}
