package graft

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.catalog.{ColumnRange, FileSkipping, LakehouseTable}

class FileSkippingSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", IntegerType), StructField("s", StringType)))
  private val stats = Map(
    "f1" -> Map("k" -> ColumnRange("0", "4"), "s" -> ColumnRange("a", "m")),
    "f2" -> Map("k" -> ColumnRange("5", "9"), "s" -> ColumnRange("n", "z")),
    "f3" -> Map.empty[String, ColumnRange]) // no stats → never skipped
  private val files = Seq("f1", "f2", "f3")

  test("pruning proves absence, keeps uncertainty") {
    def prune(f: Filter*) = FileSkipping.prune(files, stats, schema, f)
    prune(EqualTo("k", 3)) shouldBe Seq("f1", "f3")
    prune(EqualTo("k", 7)) shouldBe Seq("f2", "f3")
    prune(GreaterThan("k", 4)) shouldBe Seq("f2", "f3")
    prune(LessThanOrEqual("k", 4)) shouldBe Seq("f1", "f3")
    prune(In("k", Array(1, 2))) shouldBe Seq("f1", "f3")
    prune(EqualTo("s", "q")) shouldBe Seq("f2", "f3")
    prune(And(EqualTo("k", 3), EqualTo("s", "q"))) shouldBe Seq("f3")
    prune(Or(EqualTo("k", 3), EqualTo("s", "q"))) shouldBe files
    // unknown filter shapes never skip
    prune(StringContains("s", "x")) shouldBe files
    prune(Not(EqualTo("k", 3))) shouldBe files
    // boundary values stay inclusive
    prune(EqualTo("k", 4)) shouldBe Seq("f1", "f3")
    prune(GreaterThanOrEqual("k", 9)) shouldBe Seq("f2", "f3")
  }

  test("null-count and all-null entries prove matches impossible") {
    val nSchema = StructType(Seq(StructField("k", IntegerType), StructField("s", StringType)))
    val nStats = Map(
      // k fully non-null with range, s recorded all-null
      "f1" -> Map(
        "k" -> ColumnRange("0", "9", Some(0L)),
        "s" -> ColumnRange("", "", Some(10L), hasValues = false)),
      // no null counts recorded (old metadata)
      "f2" -> Map("k" -> ColumnRange("0", "9")))
    def prune(f: Filter*) = FileSkipping.prune(Seq("f1", "f2"), nStats, nSchema, f)
    // IS NULL skips files whose null count is provably zero
    prune(IsNull("k")) shouldBe Seq("f2")
    // all-null column: value predicates and IsNotNull can never match
    prune(EqualTo("s", "x")) shouldBe Seq("f2")
    prune(GreaterThan("s", "a")) shouldBe Seq("f2")
    prune(IsNotNull("s")) shouldBe Seq("f2")
    // ...but IS NULL on it keeps the file
    prune(IsNull("s")) shouldBe Seq("f1", "f2")
    // unknown null counts never skip on IS NULL
    prune(IsNull("s"), IsNull("k")) shouldBe Seq("f2")
  }

  test("sub-millisecond timestamp literals never mis-prune") {
    // footer stats carry full micros; java.sql.Timestamp keeps sub-ms
    // precision in the nanos field — getTime*1000 would render .0005s
    // as .000s and wrongly prune the file on an exact-match filter
    val tsSchema = StructType(Seq(StructField("ts", TimestampType)))
    val lit = java.sql.Timestamp.valueOf("2024-01-01 00:00:00.0005")
    lit.getNanos shouldBe 500000 // precision really is sub-ms
    val i = lit.toInstant
    val micros = i.getEpochSecond * 1000000L + i.getNano / 1000L
    micros % 1000 shouldBe 500 // the stats really carry the sub-ms part
    val tsStats = Map("f" -> Map("ts" -> ColumnRange(micros.toString, micros.toString)))
    def keep(f: Filter) = FileSkipping.prune(Seq("f"), tsStats, tsSchema, Seq(f))
    keep(EqualTo("ts", lit)) shouldBe Seq("f")
    keep(LessThanOrEqual("ts", lit)) shouldBe Seq("f")
    keep(GreaterThanOrEqual("ts", lit)) shouldBe Seq("f")
    // and a literal genuinely below the range still prunes
    keep(LessThan("ts", lit)) shouldBe Seq.empty
    keep(EqualTo("ts", java.sql.Timestamp.valueOf("2024-01-01 00:00:00.0004"))) shouldBe Seq.empty
  }

  test("string bounds compare in UTF-8 byte order, not UTF-16") {
    // U+FFFF > U+10000 under String.compareTo (surrogates sort low) but
    // U+FFFF < U+10000 in parquet's unsigned UTF-8 stats order — a file
    // holding both has min=U+FFFF, max=U+10000; UTF-16 comparison would
    // call the range inverted and skip a matching file
    val sSchema = StructType(Seq(StructField("s", StringType)))
    val uFFFF = "￿"
    val u10000 = new String(Character.toChars(0x10000))
    uFFFF.compareTo(u10000) should be > 0 // the UTF-16 trap is real
    FileSkipping.utf8Compare(uFFFF, u10000) should be < 0
    val sStats = Map("f" -> Map("s" -> ColumnRange(uFFFF, u10000)))
    FileSkipping.prune(Seq("f"), sStats, sSchema, Seq(EqualTo("s", uFFFF))) shouldBe Seq("f")
    FileSkipping.prune(Seq("f"), sStats, sSchema, Seq(EqualTo("s", u10000))) shouldBe Seq("f")
  }

  test("NaN literals never skip: parquet double stats exclude NaN") {
    val dSchema = StructType(Seq(StructField("d", DoubleType)))
    val dStats = Map("f" -> Map("d" -> ColumnRange("1.0", "5.0")))
    def keep(f: Filter) = FileSkipping.prune(Seq("f"), dStats, dSchema, Seq(f))
    keep(EqualTo("d", Double.NaN)) shouldBe Seq("f")
    keep(GreaterThan("d", Double.NaN)) shouldBe Seq("f")
    keep(EqualTo("d", Float.NaN)) shouldBe Seq("f")
    keep(In("d", Array[Any](Double.NaN, 9.0))) shouldBe Seq("f")
    keep(EqualTo("d", 9.0)) shouldBe Seq.empty // non-NaN still prunes
  }

  test("float/double min==max never PROVES all rows match (NaN hides from stats)") {
    // Spec-following parquet writers omit NaN from min/max: a file
    // holding [3.0, NaN] records min==max==3.0 with nulls=0. Equal
    // bounds therefore must NOT prove EqualTo/In/LessThan for every
    // row — the NaN row satisfies none of them. Conservative pruning
    // (mayMatch) may still use the bounds; exactness may not.
    val dSchema = StructType(Seq(StructField("d", DoubleType), StructField("f", FloatType)))
    val st = Map(
      "d" -> ColumnRange("3.0", "3.0", Some(0L)),
      "f" -> ColumnRange("3.0", "3.0", Some(0L)))
    FileSkipping.provesAllMatch(EqualTo("d", 3.0), dSchema, st) shouldBe false
    FileSkipping.provesAllMatch(In("d", Array[Any](3.0)), dSchema, st) shouldBe false
    FileSkipping.provesAllMatch(LessThan("d", 9.0), dSchema, st) shouldBe false
    FileSkipping.provesAllMatch(GreaterThanOrEqual("d", 1.0), dSchema, st) shouldBe false
    FileSkipping.provesAllMatch(EqualTo("f", 3.0f), dSchema, st) shouldBe false
    // IsNotNull needs only the null count — still provable for doubles
    FileSkipping.provesAllMatch(IsNotNull("d"), dSchema, st) shouldBe true
    // and an integral column with equal bounds still proves exactly
    val iSchema = StructType(Seq(StructField("k", IntegerType)))
    val iSt = Map("k" -> ColumnRange("7", "7", Some(0L)))
    FileSkipping.provesAllMatch(EqualTo("k", 7), iSchema, iSt) shouldBe true
    // conservative pruning on doubles is unaffected
    FileSkipping.prune(Seq("f1"), Map("f1" -> st), dSchema, Seq(EqualTo("d", 9.0))) shouldBe Seq.empty
  }

  test("clustered partitioned table skips whole files on key predicates") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.skip_ns")
    spark.sql("""CREATE TABLE lakehouse.skip_ns.clustered (k INT, v STRING)
      PARTITIONED BY (k)""")
    // four commits, each a disjoint key range → four files with disjoint
    // k-stats (AQE correctly coalesces each small commit to one file)
    (0 until 4).foreach { c =>
      (0 until 2500).map(i => (c * 5 + i % 5, s"v$i")).toDF("k", "v")
        .createOrReplaceTempView("skip_src")
      spark.sql("INSERT INTO lakehouse.skip_ns.clustered SELECT * FROM skip_src")
    }

    val all = spark.table("lakehouse.skip_ns.clustered")
    all.count() shouldBe 10000
    val totalFiles = LakehouseTable.lastScanFileCounts.get()._2
    totalFiles should be > 1

    val filtered = all.where($"k" === 3)
    filtered.count() shouldBe 500
    val (survivors, total) = LakehouseTable.lastScanFileCounts.get()
    total shouldBe totalFiles
    survivors should be < total // whole files eliminated from metadata

    // range predicate too
    all.where($"k" >= 18).count() shouldBe 1000
    LakehouseTable.lastScanFileCounts.get()._1 should be < total

    // and correctness: skipping returns the same rows as a full scan
    val viaFull = (0 until 10000).count(_ % 20 == 3)
    filtered.count().toInt shouldBe viaFull
    spark.sql("DROP TABLE lakehouse.skip_ns.clustered")
  }

  test("timestamp stats round-trip through skipping") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.skip_ns")
    spark.sql("""CREATE TABLE lakehouse.skip_ns.ts_t (ts TIMESTAMP, v INT)
      PARTITIONED BY (ts)""")
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // two commits with disjoint time ranges → two files, provably skippable
    (0 until 2).foreach { c =>
      (0 until 500).map(i =>
          (new java.sql.Timestamp(base.getTime + (c * 500 + i) * 3600L * 1000), i))
        .toDF("ts", "v").createOrReplaceTempView("ts_src")
      spark.sql("INSERT INTO lakehouse.skip_ns.ts_t SELECT * FROM ts_src")
    }
    val cnt = spark.table("lakehouse.skip_ns.ts_t")
      .where($"ts" >= java.sql.Timestamp.valueOf("2024-02-01 00:00:00")).count()
    cnt shouldBe 1000 - 31 * 24
    val (survivors, total) = LakehouseTable.lastScanFileCounts.get()
    total shouldBe 2
    survivors shouldBe 1 // the first month's file is eliminated by stats
    spark.sql("DROP TABLE lakehouse.skip_ns.ts_t")
  }
}
