package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Hash-bucketed tables + storage-partitioned joins: two tables
  * `PARTITIONED BY (bucket(n, k))` must join with NO shuffle on either
  * side (the 100 TB co-located-join contract). */
class BucketSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def executedPlan(df: DataFrame): String = {
    df.collect()
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    unwrap(df.queryExecution.executedPlan).toString
  }

  private def withBucketingConfs(f: => Unit): Unit = {
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("co-bucketed tables join with zero shuffle and exact results") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.bkt_ns")
    spark.sql("DROP TABLE IF EXISTS lakehouse.bkt_ns.fact")
    spark.sql("DROP TABLE IF EXISTS lakehouse.bkt_ns.dim")
    spark.sql("CREATE TABLE lakehouse.bkt_ns.fact (k INT, v BIGINT) PARTITIONED BY (bucket(4, k))")
    spark.sql("CREATE TABLE lakehouse.bkt_ns.dim (k INT, label STRING) PARTITIONED BY (bucket(4, k))")
    // two commits each → multiple files per bucket, all still co-located
    Seq.tabulate(500)(i => (i % 50, i.toLong)).toDF("k", "v").createOrReplaceTempView("f_src")
    spark.sql("INSERT INTO lakehouse.bkt_ns.fact SELECT * FROM f_src")
    spark.sql("INSERT INTO lakehouse.bkt_ns.fact SELECT k, v + 1000 FROM f_src")
    Seq.tabulate(50)(i => (i, s"l$i")).toDF("k", "label").createOrReplaceTempView("d_src")
    spark.sql("INSERT INTO lakehouse.bkt_ns.dim SELECT * FROM d_src")

    val expected = spark.table("lakehouse.bkt_ns.fact")
      .join(spark.table("lakehouse.bkt_ns.dim"), "k")
      .groupBy($"label").count()
      .orderBy($"label").as[(String, Long)].collect().toSeq

    withBucketingConfs {
      val joined = spark.table("lakehouse.bkt_ns.fact")
        .join(spark.table("lakehouse.bkt_ns.dim"), "k")
      val plan = executedPlan(joined)
      // storage-partitioned join: no exchange on either join input
      plan should not include "Exchange"
      joined.count() shouldBe 1000

      val got = joined.groupBy($"label").count()
        .orderBy($"label").as[(String, Long)].collect().toSeq
      got shouldBe expected
    }
    spark.sql("DROP TABLE lakehouse.bkt_ns.fact")
    spark.sql("DROP TABLE lakehouse.bkt_ns.dim")
  }

  test("bucketed scan keeps normal behavior when v2 bucketing is off") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.bkt_ns")
    spark.sql("DROP TABLE IF EXISTS lakehouse.bkt_ns.plain")
    spark.sql("CREATE TABLE lakehouse.bkt_ns.plain (k INT, v BIGINT) PARTITIONED BY (bucket(4, k))")
    Seq.tabulate(100)(i => (i % 10, i.toLong)).toDF("k", "v").createOrReplaceTempView("p_src")
    spark.sql("INSERT INTO lakehouse.bkt_ns.plain SELECT * FROM p_src")
    spark.table("lakehouse.bkt_ns.plain").count() shouldBe 100
    spark.table("lakehouse.bkt_ns.plain").where($"k" === 3).count() shouldBe 10
    spark.sql("DROP TABLE lakehouse.bkt_ns.plain")
  }

  test("compact restores bucket layout after a rewrite breaks it") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.bkt_ns")
    spark.sql("DROP TABLE IF EXISTS lakehouse.bkt_ns.rw")
    spark.sql("DROP TABLE IF EXISTS lakehouse.bkt_ns.rwdim")
    spark.sql("CREATE TABLE lakehouse.bkt_ns.rw (k INT, v BIGINT) PARTITIONED BY (bucket(4, k))")
    spark.sql("CREATE TABLE lakehouse.bkt_ns.rwdim (k INT, l STRING) PARTITIONED BY (bucket(4, k))")
    Seq.tabulate(200)(i => (i % 20, i.toLong)).toDF("k", "v").createOrReplaceTempView("rw_src")
    spark.sql("INSERT INTO lakehouse.bkt_ns.rw SELECT * FROM rw_src")
    Seq.tabulate(20)(i => (i, s"l$i")).toDF("k", "l").createOrReplaceTempView("rwd_src")
    spark.sql("INSERT INTO lakehouse.bkt_ns.rwdim SELECT * FROM rwd_src")

    // a COW delete now rewrites surviving rows back into a BUCKETED
    // commit (the one layout writer), so zero-shuffle planning survives
    // the DML directly — previously the layout broke here and only
    // compaction repaired it
    spark.sql("DELETE FROM lakehouse.bkt_ns.rw WHERE k = 3")

    withBucketingConfs {
      def joinPlan(): String = executedPlan(
        spark.table("lakehouse.bkt_ns.rw").join(spark.table("lakehouse.bkt_ns.rwdim"), "k"))
      joinPlan() should not include "Exchange"
      spark.table("lakehouse.bkt_ns.rw").join(spark.table("lakehouse.bkt_ns.rwdim"), "k")
        .count() shouldBe 190
      // compaction stays the repair path for layouts broken by other
      // means (e.g. positional-delta data files) and must be idempotent
      // on an intact one
      graft.catalog.Maintenance.compact(spark, "lakehouse", Seq("bkt_ns"), "rw")
      joinPlan() should not include "Exchange"
      spark.table("lakehouse.bkt_ns.rw").join(spark.table("lakehouse.bkt_ns.rwdim"), "k")
        .count() shouldBe 190
    }
    spark.sql("DROP TABLE lakehouse.bkt_ns.rw")
    spark.sql("DROP TABLE lakehouse.bkt_ns.rwdim")
  }

  test("bucketed CTAS lays out buckets; joins the co-bucketed dim shuffle-free") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.bkt_ns")
    spark.sql("DROP TABLE IF EXISTS lakehouse.bkt_ns.ctas")
    spark.sql("DROP TABLE IF EXISTS lakehouse.bkt_ns.ctasdim")
    Seq.tabulate(300)(i => (i % 30, i.toLong)).toDF("k", "v").createOrReplaceTempView("ct_src")
    spark.sql("""CREATE TABLE lakehouse.bkt_ns.ctas PARTITIONED BY (bucket(4, k))
                |AS SELECT * FROM ct_src""".stripMargin)
    Seq.tabulate(30)(i => (i, s"l$i")).toDF("k", "l").createOrReplaceTempView("ctd_src")
    spark.sql("""CREATE TABLE lakehouse.bkt_ns.ctasdim PARTITIONED BY (bucket(4, k))
                |AS SELECT * FROM ctd_src""".stripMargin)
    withBucketingConfs {
      val joined = spark.table("lakehouse.bkt_ns.ctas")
        .join(spark.table("lakehouse.bkt_ns.ctasdim"), "k")
      executedPlan(joined) should not include "Exchange"
      joined.count() shouldBe 300
    }
    spark.sql("DROP TABLE lakehouse.bkt_ns.ctas")
    spark.sql("DROP TABLE lakehouse.bkt_ns.ctasdim")
  }

  test("bucket function matches the physical layout's hash partitioning") {
    // the FunctionCatalog-visible bucket() must agree with
    // repartition(n, col) for EVERY supported key type, or a
    // storage-partitioned join on that type would silently misalign
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions.spark_partition_id
    val n = 4

    def bound(dt: DataType) = graft.catalog.BucketFunction.bind(
      StructType(Seq(StructField("n", IntegerType), StructField("v", dt))))
      .asInstanceOf[org.apache.spark.sql.connector.catalog.functions.ScalarFunction[Integer]]

    // Int keys
    val ints = bound(IntegerType)
    Seq.tabulate(100)(i => Tuple1(i)).toDF("k").repartition(n, $"k")
      .select($"k", spark_partition_id()).as[(Int, Int)].collect()
      .foreach { case (k, pid) =>
        ints.produceResult(InternalRow(n, k)).intValue() shouldBe pid
      }

    // Long keys
    val longs = bound(LongType)
    Seq.tabulate(100)(i => Tuple1(i.toLong * 1000003L)).toDF("k").repartition(n, $"k")
      .select($"k", spark_partition_id()).as[(Long, Int)].collect()
      .foreach { case (k, pid) =>
        longs.produceResult(InternalRow(n, k)).intValue() shouldBe pid
      }

    // String keys (catalyst hashes UTF8String bytes, not java String)
    val strs = bound(StringType)
    Seq.tabulate(100)(i => Tuple1(s"key-$i")).toDF("k").repartition(n, $"k")
      .select($"k", spark_partition_id()).as[(String, Int)].collect()
      .foreach { case (k, pid) =>
        strs.produceResult(InternalRow(n,
          org.apache.spark.unsafe.types.UTF8String.fromString(k))).intValue() shouldBe pid
      }

    // Null keys: HashPartitioning leaves the seed as the hash, so null
    // rows land in bucket pmod(42, n) — the function must agree
    val nullDf = (Seq.tabulate(20)(i => Some(i)) :+ (None: Option[Int]))
      .toDF("k").repartition(n, $"k")
      .select($"k", spark_partition_id()).as[(Option[Int], Int)].collect()
    nullDf.collect { case (None, pid) => pid }.foreach { pid =>
      ints.produceResult(InternalRow(n, null)).intValue() shouldBe pid
    }

    // Date keys (stored as Int days)
    val dates = bound(DateType)
    Seq.tabulate(100)(i => Tuple1(java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i))))
      .toDF("k").repartition(n, $"k")
      .select($"k", spark_partition_id()).as[(java.sql.Date, Int)].collect()
      .foreach { case (k, pid) =>
        val days = k.toLocalDate.toEpochDay.toInt
        dates.produceResult(InternalRow(n, days)).intValue() shouldBe pid
      }
  }

  test("iceberg bucket hash matches the spec's Appendix B test vectors") {
    import graft.catalog.IcebergHash
    import org.apache.spark.unsafe.types.UTF8String
    IcebergHash.hashLong(34L) shouldBe 2017239379 // int AND long 34
    IcebergHash.hashString(UTF8String.fromString("iceberg")) shouldBe 1210000089
    IcebergHash.hashBytes(Array[Byte](0, 1, 2, 3)) shouldBe -188683207
    IcebergHash.hashDecimal(
      org.apache.spark.sql.types.Decimal(BigDecimal("14.20"))) shouldBe -500754589
    IcebergHash.hashLong(
      java.time.LocalDate.of(2017, 11, 16).toEpochDay) shouldBe -653330422 // date
    val micros = java.time.Instant.parse("2017-11-16T22:31:08Z")
      .getEpochSecond * 1000000L
    IcebergHash.hashLong(micros) shouldBe -2047944441 // timestamp micros
  }

  test("graft.bucket.hash=iceberg lays files out by the ICEBERG bucket id") {
    import graft.catalog.{Bucketing, IcebergHash}
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.bkt_ns")
    spark.sql("DROP TABLE IF EXISTS lakehouse.bkt_ns.ice")
    spark.sql(
      """CREATE TABLE lakehouse.bkt_ns.ice (k INT, v BIGINT)
        |PARTITIONED BY (bucket(4, k))
        |TBLPROPERTIES ('graft.bucket.hash'='iceberg')""".stripMargin)
    Seq.tabulate(400)(i => (i, i.toLong)).toDF("k", "v").createOrReplaceTempView("ice_src")
    spark.sql("INSERT INTO lakehouse.bkt_ns.ice SELECT * FROM ice_src")
    spark.table("lakehouse.bkt_ns.ice").count() shouldBe 400

    // every data file's rows must hash (per the published spec) to the
    // file's claimed bucket id — the invariant the mirror exports
    val dataDir = java.nio.file.Paths.get(TestSpark.warehouse, "bkt_ns", "ice", "data")
    val files = java.nio.file.Files.walk(dataDir).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet")).toSeq
    files should not be empty
    var checked = 0
    files.foreach { p =>
      val rel = s"data/${dataDir.relativize(p).toString.replace('\\', '/')}"
      val bucket = Bucketing.bucketIdOf(rel)
      bucket.isDefined shouldBe true
      spark.read.parquet(p.toString).select("k").as[Int].collect().foreach { k =>
        IcebergHash.bucketOf(k, org.apache.spark.sql.types.IntegerType, 4) shouldBe bucket.get
        checked += 1
      }
    }
    checked shouldBe 400
    spark.sql("DROP TABLE lakehouse.bkt_ns.ice")
  }

  test("co-bucketed iceberg-hash tables join with zero shuffle; mixed hashes do not") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.bkt_ns")
    Seq("icef", "iced", "sparkd").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS lakehouse.bkt_ns.$t"))
    spark.sql(
      """CREATE TABLE lakehouse.bkt_ns.icef (k INT, v BIGINT)
        |PARTITIONED BY (bucket(4, k))
        |TBLPROPERTIES ('graft.bucket.hash'='iceberg')""".stripMargin)
    spark.sql(
      """CREATE TABLE lakehouse.bkt_ns.iced (k INT, label STRING)
        |PARTITIONED BY (bucket(4, k))
        |TBLPROPERTIES ('graft.bucket.hash'='iceberg')""".stripMargin)
    // a spark-hash dim on the same key: its layout DIFFERS, co-locating
    // it with an iceberg-hash fact would silently misjoin
    spark.sql(
      """CREATE TABLE lakehouse.bkt_ns.sparkd (k INT, label STRING)
        |PARTITIONED BY (bucket(4, k))""".stripMargin)
    Seq.tabulate(500)(i => (i % 50, i.toLong)).toDF("k", "v").createOrReplaceTempView("if_src")
    spark.sql("INSERT INTO lakehouse.bkt_ns.icef SELECT * FROM if_src")
    spark.sql("INSERT INTO lakehouse.bkt_ns.icef SELECT k, v + 1000 FROM if_src")
    Seq.tabulate(50)(i => (i, s"l$i")).toDF("k", "label").createOrReplaceTempView("id_src")
    spark.sql("INSERT INTO lakehouse.bkt_ns.iced SELECT * FROM id_src")
    spark.sql("INSERT INTO lakehouse.bkt_ns.sparkd SELECT * FROM id_src")

    val expected = spark.table("lakehouse.bkt_ns.icef")
      .join(spark.table("lakehouse.bkt_ns.iced"), "k")
      .groupBy($"label").count()
      .orderBy($"label").as[(String, Long)].collect().toSeq

    withBucketingConfs {
      val joined = spark.table("lakehouse.bkt_ns.icef")
        .join(spark.table("lakehouse.bkt_ns.iced"), "k")
      executedPlan(joined) should not include "Exchange"
      joined.count() shouldBe 1000
      joined.groupBy($"label").count()
        .orderBy($"label").as[(String, Long)].collect().toSeq shouldBe expected

      // mixed: distinct function canonical names → NOT planned co-located
      val mixed = spark.table("lakehouse.bkt_ns.icef")
        .join(spark.table("lakehouse.bkt_ns.sparkd"), "k")
      executedPlan(mixed) should include("Exchange")
      mixed.count() shouldBe 1000
    }
    Seq("icef", "iced", "sparkd").foreach(t =>
      spark.sql(s"DROP TABLE lakehouse.bkt_ns.$t"))
  }

  test("bucket layout props freeze once data exists; compact repairs under the DECLARED hash") {
    import graft.catalog.{Bucketing, IcebergHash}
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.bkt_ns")
    Seq("frz", "icerw").foreach(t => spark.sql(s"DROP TABLE IF EXISTS lakehouse.bkt_ns.$t"))
    spark.sql(
      """CREATE TABLE lakehouse.bkt_ns.frz (k INT, v BIGINT)
        |PARTITIONED BY (bucket(4, k))
        |TBLPROPERTIES ('graft.bucket.hash'='iceberg')""".stripMargin)
    // empty table: the layout contract may still change
    spark.sql("ALTER TABLE lakehouse.bkt_ns.frz SET TBLPROPERTIES ('graft.bucket.hash'='spark')")
    spark.sql("ALTER TABLE lakehouse.bkt_ns.frz SET TBLPROPERTIES ('graft.bucket.hash'='iceberg')")
    Seq.tabulate(100)(i => (i, i.toLong)).toDF("k", "v").createOrReplaceTempView("frz_src")
    spark.sql("INSERT INTO lakehouse.bkt_ns.frz SELECT * FROM frz_src")
    // non-empty: flipping the hash (or dropping the spec) would make
    // scans claim a layout the files don't have — refused
    val e1 = intercept[Exception] {
      spark.sql("ALTER TABLE lakehouse.bkt_ns.frz SET TBLPROPERTIES ('graft.bucket.hash'='spark')")
    }
    e1.getMessage should include("existing data")
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE lakehouse.bkt_ns.frz UNSET TBLPROPERTIES ('graft.bucket.hash')")
    }
    e2.getMessage should include("existing data")
    spark.sql("DROP TABLE lakehouse.bkt_ns.frz")

    // compaction after a COW rewrite must re-bucket with ICEBERG's
    // hash on an iceberg-hash table — spark-hash would silently
    // relabel every part file (wrong SPJ, wrong exported tuples)
    spark.sql(
      """CREATE TABLE lakehouse.bkt_ns.icerw (k INT, v BIGINT)
        |PARTITIONED BY (bucket(4, k))
        |TBLPROPERTIES ('graft.bucket.hash'='iceberg')""".stripMargin)
    Seq.tabulate(200)(i => (i % 40, i.toLong)).toDF("k", "v").createOrReplaceTempView("icerw_src")
    spark.sql("INSERT INTO lakehouse.bkt_ns.icerw SELECT * FROM icerw_src")
    spark.sql("DELETE FROM lakehouse.bkt_ns.icerw WHERE k = 3") // breaks the b- mapping
    graft.catalog.Maintenance.compact(spark, "lakehouse", Seq("bkt_ns"), "icerw")
    // the CURRENT snapshot's files (older commits' files remain on disk
    // for time travel — only the live layout carries the contract)
    val tdir = java.nio.file.Paths.get(TestSpark.warehouse, "bkt_ns", "icerw")
    val live = graft.catalog.TableMetadata.load(tdir).files
    var checked = 0
    live.foreach { rel =>
      val bucket = Bucketing.bucketIdOf(rel)
      bucket.isDefined shouldBe true
      spark.read.parquet(tdir.resolve(rel).toString)
        .select("k").as[Int].collect().foreach { k =>
          IcebergHash.bucketOf(k, org.apache.spark.sql.types.IntegerType, 4) shouldBe bucket.get
          checked += 1
        }
    }
    checked shouldBe 195
    spark.sql("DROP TABLE lakehouse.bkt_ns.icerw")
  }

  test("equality on the bucket column prunes to the matching bucket's files") {
    import graft.catalog.LakehouseTable
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.bkt_ns")
    Seq("bp", "bpi").foreach(t => spark.sql(s"DROP TABLE IF EXISTS lakehouse.bkt_ns.$t"))
    spark.sql("CREATE TABLE lakehouse.bkt_ns.bp (k INT, v BIGINT) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql(
      """CREATE TABLE lakehouse.bkt_ns.bpi (k INT, v BIGINT)
        |PARTITIONED BY (bucket(4, k))
        |TBLPROPERTIES ('graft.bucket.hash'='iceberg')""".stripMargin)
    Seq.tabulate(400)(i => (i % 40, i.toLong)).toDF("k", "v").createOrReplaceTempView("bp_src")
    // two commits -> 8 bucket-addressable files per table
    Seq("bp", "bpi").foreach { t =>
      spark.sql(s"INSERT INTO lakehouse.bkt_ns.$t SELECT * FROM bp_src")
      spark.sql(s"INSERT INTO lakehouse.bkt_ns.$t SELECT k, v + 1000 FROM bp_src")
    }
    Seq("bp", "bpi").foreach { t =>
      // point lookup: only the wanted bucket's files open (1/4 of the
      // table), rows exact under both hashes
      spark.table(s"lakehouse.bkt_ns.$t").where($"k" === 7).count() shouldBe 20
      val (survEq, totalEq) = LakehouseTable.lastScanFileCounts.get()
      withClue(s"$t eq: ") { totalEq shouldBe 8; survEq shouldBe 2 }
      // IN list: union of the named buckets only
      spark.table(s"lakehouse.bkt_ns.$t").where($"k".isin(7, 9)).count() shouldBe 40
      val (survIn, totalIn) = LakehouseTable.lastScanFileCounts.get()
      withClue(s"$t in: ") {
        totalIn shouldBe 8
        survIn should be <= 4
        survIn should be >= 2
      }
      // a non-bucket-column filter never bucket-prunes
      spark.table(s"lakehouse.bkt_ns.$t").where($"v" === 7L).count() shouldBe 1
    }
    Seq("bp", "bpi").foreach(t => spark.sql(s"DROP TABLE lakehouse.bkt_ns.$t"))
  }

  test("DELETE on the bucket column touches only the matching bucket's files") {
    import graft.catalog.{Bucketing, IcebergHash, TableMetadata}
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.bkt_ns")
    spark.sql("DROP TABLE IF EXISTS lakehouse.bkt_ns.bdel")
    spark.sql(
      """CREATE TABLE lakehouse.bkt_ns.bdel (k INT, v BIGINT)
        |PARTITIONED BY (bucket(4, k))
        |TBLPROPERTIES ('graft.bucket.hash'='iceberg')""".stripMargin)
    Seq.tabulate(400)(i => (i % 40, i.toLong)).toDF("k", "v").createOrReplaceTempView("bdel_src")
    spark.sql("INSERT INTO lakehouse.bkt_ns.bdel SELECT * FROM bdel_src")
    spark.sql("INSERT INTO lakehouse.bkt_ns.bdel SELECT k, v + 1000 FROM bdel_src")
    val dir = java.nio.file.Paths.get(TestSpark.warehouse, "bkt_ns", "bdel")
    val before = TableMetadata.load(dir).files.toSet
    before.size shouldBe 8

    spark.sql("DELETE FROM lakehouse.bkt_ns.bdel WHERE k = 7")
    val after = TableMetadata.load(dir).files.toSet
    // the COW rewrite candidates were bucket-pruned: every untouched
    // bucket's files carry by reference, only bucket(7)'s two rewrote
    val b7 = IcebergHash.bucketOf(7, org.apache.spark.sql.types.IntegerType, 4)
    val removed = before -- after
    removed.size shouldBe 2
    removed.foreach(f => Bucketing.bucketIdOf(f) shouldBe Some(b7))
    // the REPLACEMENT files keep the layout contract: every live file
    // stays bucket-addressable (and the rewrites hold bucket b7's rows
    // under the declared iceberg hash), so KeyGroupedPartitioning and
    // the mirror's bucket[n] claim survive the DELETE
    (after -- before).foreach { f =>
      val b = Bucketing.bucketIdOf(f)
      withClue(s"$f: ") { b shouldBe Some(b7) }
      spark.read.parquet(dir.resolve(f).toString)
        .select("k").as[Int].collect().foreach { k =>
          IcebergHash.bucketOf(k, org.apache.spark.sql.types.IntegerType, 4) shouldBe b7
        }
    }
    spark.table("lakehouse.bkt_ns.bdel").count() shouldBe 780
    spark.table("lakehouse.bkt_ns.bdel").where($"k" === 7).count() shouldBe 0
    spark.sql("DROP TABLE lakehouse.bkt_ns.bdel")
  }

  /** Every bucket-addressable (`b-`) data file of `table` must hold only
    * rows whose ICEBERG bucket id equals the file's claimed index — the
    * invariant scans report, pruning trusts, and the mirror exports. */
  private def assertIcebergLayout(table: String, n: Int, expectRows: Int): Unit = {
    import graft.catalog.{Bucketing, IcebergHash}
    val dataDir = java.nio.file.Paths.get(TestSpark.warehouse, "bkt_ns", table, "data")
    val files = java.nio.file.Files.walk(dataDir).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet")).toSeq
    files should not be empty
    var checked = 0
    files.foreach { p =>
      val rel = s"data/${dataDir.relativize(p).toString.replace('\\', '/')}"
      val bucket = Bucketing.bucketIdOf(rel)
      withClue(s"$rel not bucket-addressable: ") { bucket.isDefined shouldBe true }
      spark.read.parquet(p.toString).select("k").as[Int].collect().foreach { k =>
        withClue(s"$rel row k=$k: ") {
          IcebergHash.bucketOf(k, org.apache.spark.sql.types.IntegerType, n) shouldBe bucket.get
        }
        checked += 1
      }
    }
    checked shouldBe expectRows
  }

  test("CTAS on an iceberg-hash table lays files out by the ICEBERG bucket id") {
    // regression: CTAS/RTAS staged writes used to cluster with Spark's
    // murmur3 while writing bucket-addressable b- files — scans then
    // reported a KeyGroupedPartitioning the layout didn't have, point
    // lookups pruned the wrong bucket, and the mirror exported wrong
    // bucket tuples. CTAS must write the same layout as the INSERT path.
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.bkt_ns")
    spark.sql("DROP TABLE IF EXISTS lakehouse.bkt_ns.ctas_ice")
    Seq.tabulate(400)(i => (i, i.toLong)).toDF("k", "v")
      .createOrReplaceTempView("ctas_ice_src")
    spark.sql(
      """CREATE TABLE lakehouse.bkt_ns.ctas_ice
        |PARTITIONED BY (bucket(4, k))
        |TBLPROPERTIES ('graft.bucket.hash'='iceberg')
        |AS SELECT * FROM ctas_ice_src""".stripMargin)
    spark.table("lakehouse.bkt_ns.ctas_ice").count() shouldBe 400
    assertIcebergLayout("ctas_ice", 4, 400)
    // and the layout actually serves a pruned point lookup correctly
    spark.table("lakehouse.bkt_ns.ctas_ice")
      .where($"k" === 123).as[(Int, Long)].collect() shouldBe Array((123, 123L))
    spark.sql("DROP TABLE lakehouse.bkt_ns.ctas_ice")
  }

  test("transactionalAppend on an iceberg-hash table lays files out by the ICEBERG bucket id") {
    // regression: the streaming exactly-once append wrote b- commits
    // clustered with Spark's hash regardless of graft.bucket.hash
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.bkt_ns")
    spark.sql("DROP TABLE IF EXISTS lakehouse.bkt_ns.txn_ice")
    spark.sql(
      """CREATE TABLE lakehouse.bkt_ns.txn_ice (k INT, v BIGINT)
        |PARTITIONED BY (bucket(4, k))
        |TBLPROPERTIES ('graft.bucket.hash'='iceberg')""".stripMargin)
    val batch = Seq.tabulate(200)(i => (i, i.toLong)).toDF("k", "v")
    import graft.catalog.Maintenance
    Maintenance.transactionalAppend(
      spark, "lakehouse", Seq("bkt_ns"), "txn_ice", batch, "txnA", 0L) shouldBe true
    Maintenance.transactionalAppend(
      spark, "lakehouse", Seq("bkt_ns"), "txn_ice",
      Seq.tabulate(200)(i => (i + 200, i.toLong + 200)).toDF("k", "v"),
      "txnA", 1L) shouldBe true
    spark.table("lakehouse.bkt_ns.txn_ice").count() shouldBe 400
    assertIcebergLayout("txn_ice", 4, 400)
    spark.sql("DROP TABLE lakehouse.bkt_ns.txn_ice")
  }

  test("layoutNotice flags only the recoverable trap: spark-hash bucketing a hashable type") {
    import graft.catalog.Bucketing
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("k", IntegerType), StructField("d", DoubleType)))
    def props(c: String, hash: Option[String]) =
      Map(Bucketing.ColProp -> c, Bucketing.CountProp -> "4") ++
        hash.map(Bucketing.HashProp -> _)
    // spark-hash over an iceberg-hashable type: the user COULD have kept
    // external pruning — warn at the only moment the choice is open
    Bucketing.layoutNotice(schema, props("k", None)).isDefined shouldBe true
    Bucketing.layoutNotice(schema, props("k", Some("spark"))).isDefined shouldBe true
    // already exportable: silent
    Bucketing.layoutNotice(schema, props("k", Some("iceberg"))) shouldBe None
    // no opt-in was ever possible (double has no published-hash encoding)
    Bucketing.layoutNotice(schema, props("d", None)) shouldBe None
    // unbucketed: silent
    Bucketing.layoutNotice(schema, Map.empty) shouldBe None
  }

  test("MoR positional UPDATE and keyed upsert keep the iceberg bucket layout") {
    import graft.catalog.{Bucketing, MergeOnRead, TableMetadata}
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.bkt_ns")
    spark.sql("DROP TABLE IF EXISTS lakehouse.bkt_ns.morb")
    spark.sql(
      """CREATE TABLE lakehouse.bkt_ns.morb (k INT, v BIGINT)
        |PARTITIONED BY (bucket(4, k))
        |TBLPROPERTIES ('graft.bucket.hash'='iceberg',
        |  'write.update.mode'='merge-on-read')""".stripMargin)
    Seq.tabulate(200)(i => (i, i.toLong)).toDF("k", "v")
      .createOrReplaceTempView("morb_src")
    spark.sql("INSERT INTO lakehouse.bkt_ns.morb SELECT * FROM morb_src")
    // keyed positional UPDATE (morUpdateWhere): replacement rows land
    // bucket-addressable through the one layout writer
    MergeOnRead.morUpdateWhere(spark, "lakehouse", Seq("bkt_ns"), "morb",
      $"k" < 20, Map("v" -> ($"v" + 1000L))) shouldBe 20L
    // keyed upsert: the appended batch also clusters under the declared hash
    MergeOnRead.morUpsert(spark, "lakehouse", Seq("bkt_ns"), "morb",
      Seq((300, 300L), (301, 301L)).toDF("k", "v"), Seq("k"))
    // physical rows: 200 originals (superseded ones masked by delete
    // entries, still correctly bucketed) + 20 replacements + 2 upserts
    assertIcebergLayout("morb", 4, 222)
    spark.table("lakehouse.bkt_ns.morb").count() shouldBe 202
    spark.table("lakehouse.bkt_ns.morb")
      .where($"k" === 5).as[(Int, Long)].collect() shouldBe Array((5, 1005L))
    spark.table("lakehouse.bkt_ns.morb")
      .where($"k" === 300).as[(Int, Long)].collect() shouldBe Array((300, 300L))

    // the SQL positional-delta path (per-task writers, rows span
    // buckets) honestly degrades addressability; reads stay exact and
    // compaction repairs — the documented contract
    spark.sql("UPDATE lakehouse.bkt_ns.morb SET v = v + 1 WHERE k IN (30, 31)")
    val dir = java.nio.file.Paths.get(TestSpark.warehouse, "bkt_ns", "morb")
    TableMetadata.load(dir).files
      .exists(f => Bucketing.bucketIdOf(f).isEmpty) shouldBe true
    spark.table("lakehouse.bkt_ns.morb")
      .where($"k" === 30).as[(Int, Long)].collect() shouldBe Array((30, 31L))
    graft.catalog.Maintenance.compact(spark, "lakehouse", Seq("bkt_ns"), "morb")
    TableMetadata.load(dir).files
      .forall(f => Bucketing.bucketIdOf(f).isDefined) shouldBe true
    spark.table("lakehouse.bkt_ns.morb").count() shouldBe 202
    spark.sql("DROP TABLE lakehouse.bkt_ns.morb")
  }

  test("iceberg hash mode validates the bucket column type at CREATE") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.bkt_ns")
    spark.sql("DROP TABLE IF EXISTS lakehouse.bkt_ns.badice")
    val e = intercept[Exception] {
      spark.sql(
        """CREATE TABLE lakehouse.bkt_ns.badice (k DOUBLE, v BIGINT)
          |PARTITIONED BY (bucket(4, k))
          |TBLPROPERTIES ('graft.bucket.hash'='iceberg')""".stripMargin)
    }
    e.getMessage should include("iceberg")
  }
}
