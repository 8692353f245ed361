package graft

import java.nio.file.{Files, Path, StandardCopyOption}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins the r20 fingerprint hardening of Tables' parquet schema memo
  * (r19 verdict item: "(size, mtime) fingerprints without the
  * monotonic-mtime guard"): a regenerated fixture that lands with the
  * SAME byte size and the SAME millisecond mtime as its predecessor
  * must still re-infer — the fingerprint now carries the nanosecond
  * mtime and the fileKey (inode), so an atomic-replace rewrite can
  * never serve the stale schema even on a coarse-mtime filesystem. */
class SchemaCacheSpec extends AnyFunSuite with Matchers {

  private def writeParquet(dir: Path, name: String, colName: String): Path = {
    val s = TestSpark.spark
    import s.implicits._
    val tmp = Files.createTempDirectory("schemacache-stage-")
    Seq(1L, 2L, 3L).toDF(colName).coalesce(1)
      .write.mode("overwrite").parquet(tmp.resolve("out").toString)
    val part = graft.catalog.Fs.children(tmp.resolve("out"))
      .find(_.getFileName.toString.endsWith(".parquet")).get
    val dest = dir.resolve(s"$name.parquet")
    Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
    dest
  }

  test("fileFingerprint distinguishes a same-size same-millisecond atomic replace") {
    val dir = Files.createTempDirectory("fp-")
    val a = dir.resolve("x.bin")
    Files.write(a, Array.fill[Byte](64)(1))
    val m0 = Files.getLastModifiedTime(a)
    val fp0 = Tables.fileFingerprint(a.toFile)
    fp0.isDefined shouldBe true
    // replacement: same size, mtime FORCED equal (the coarse-fs hole)
    val b = dir.resolve("y.bin")
    Files.write(b, Array.fill[Byte](64)(2))
    Files.move(b, a, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    Files.setLastModifiedTime(a, m0)
    val fp1 = Tables.fileFingerprint(a.toFile)
    fp1.isDefined shouldBe true
    // the (length, lastModified-millis) fingerprint this replaces was
    // identical here; the inode in the fileKey tells them apart
    fp1 should not be fp0
    // directories never fingerprint (they cannot track their contents)
    Tables.fileFingerprint(dir.toFile) shouldBe None
    // absent files never fingerprint
    Tables.fileFingerprint(dir.resolve("missing").toFile) shouldBe None
  }

  test("a regenerated same-size same-mtime fixture re-infers its schema") {
    val s = TestSpark.spark
    val dir = Files.createTempDirectory("schemacache-")
    val p = writeParquet(dir, "t", "aa")
    Tables.table(s, dir.toString, "t").schema.fieldNames shouldBe Array("aa")
    val m0 = Files.getLastModifiedTime(p)
    val sz0 = Files.size(p)
    // regenerate with a DIFFERENT schema, then force the previous
    // mtime onto the replacement — the worst case a coarse-mtime
    // filesystem can produce
    val p2 = writeParquet(dir, "t2", "bb")
    Files.size(p2) shouldBe sz0 // same column width/rows → same bytes
    Files.move(p2, p, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    Files.setLastModifiedTime(p, m0)
    Tables.table(s, dir.toString, "t").schema.fieldNames shouldBe Array("bb")
  }
}
