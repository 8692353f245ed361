package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) vector index materialized INTO the lakehouse
  * catalog: the coarse quantizer is trained driver-side on a bounded
  * sample, every vector is assigned its nearest centroid with a
  * codegen'd argmin, and the corpus is written to a lakehouse table
  * PARTITIONED BY (cell). The insert path clusters files by partition
  * column and records per-file min/max stats, so an ANN probe that
  * filters `cell IN (<nprobe closest>)` prunes to nprobe/k of the DATA
  * FILES from metadata alone — the property that makes IVF the 100 TB
  * similarity-search layout (FAISS's IVF list = our partition;
  * reference's Iceberg partition pruning = our file skipping).
  */
object VectorIndex {

  /** Deterministic Lloyd k-means on a driver-side sample: init = first
    * k sample points, so the quantizer is bit-reproducible across runs
    * and scale factors. Training on a bounded sample (FAISS trains on
    * ~256·k points) keeps index build one distributed pass: only the
    * assignment touches the full corpus. */
  def trainKMeans(sample: Array[Array[Float]], k: Int, iters: Int): Array[Array[Double]] = {
    require(sample.nonEmpty, "k-means: empty training sample")
    val dim = sample.head.length
    val cent = Array.tabulate(k)(i => sample(i % sample.length).map(_.toDouble))
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val cnts = new Array[Long](k)
      sample.foreach { v =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var dd = 0.0; var i = 0
          while (i < dim) { val t = v(i) - cent(c)(i); dd += t * t; i += 1 }
          if (dd < bestD) { bestD = dd; best = c }
          c += 1
        }
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
        cnts(best) += 1
      }
      for (c <- 0 until k if cnts(c) > 0; i <- 0 until dim)
        cent(c)(i) = sums(c)(i) / cnts(c)
    }
    cent
  }

  /** Nearest-centroid cell id for a float-vector column: codegen'd
    * argmin over the broadcast centroid array — array_min on
    * struct(dist, cell) is the deterministic (dist, then cell) argmin.
    * Requires [[graft.functions.GraftFunctions.register]]. */
  def cellOf(v: Column, cents: Array[Array[Double]]): Column = {
    val k = cents.length
    val centArr = typedLit(cents.map(_.toSeq).toSeq)
    val centNorm = typedLit(cents.map(c => c.map(x => x * x).sum).toSeq)
    array_min(transform(sequence(lit(0), lit(k - 1)), c =>
      struct(
        (element_at(centNorm, c + 1) -
          lit(2.0) * call_function("vec_dot_d", v, element_at(centArr, c + 1))).as("dist"),
        c.as("cell")))).getField("cell")
  }

  /** Train a quantizer on `embeddings` (columns vec_id, embedding) and
    * materialize the cell-partitioned index table. Returns the
    * centroids (the query-side probe list is computed from them). */
  def build(
      spark: SparkSession,
      embeddings: DataFrame,
      table: String,
      k: Int = 16,
      sampleN: Int = 2048,
      iters: Int = 3): Array[Array[Double]] = {
    graft.functions.GraftFunctions.register(spark)
    val sample = embeddings.orderBy(col("vec_id")).limit(sampleN)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray)
    val cents = trainKMeans(sample, k, iters)
    spark.sql(
      s"CREATE TABLE $table (vec_id BIGINT, embedding ARRAY<FLOAT>, cell INT) PARTITIONED BY (cell)")
    embeddings.select(col("vec_id"), col("embedding"),
        cellOf(col("embedding"), cents).cast("int").as("cell"))
      .createOrReplaceTempView("ivf_src")
    spark.sql(s"INSERT INTO $table SELECT vec_id, embedding, cell FROM ivf_src")
    cents
  }

  // ---- incremental maintenance -------------------------------------------
  //
  // The quantizer is part of the index: centroids, training error, and
  // the covered source version persist as index-table properties, so a
  // later refresh can (a) assign cells to ONLY the appended vectors
  // with the stored centroids — one pass over the delta, old index
  // files untouched — and (b) detect distribution drift (new vectors
  // quantizing much worse than the training sample) and re-train only
  // then. Same contract as MaterializedView.refresh over
  // Maintenance.changesBetween.

  val SourceProp = "graft.ivf.source"
  val VersionProp = "graft.ivf.sourceVersion"
  val CentroidsProp = "graft.ivf.centroids"
  val TrainErrProp = "graft.ivf.trainErr"
  val KProp = "graft.ivf.k"
  val SampleNProp = "graft.ivf.sampleN"
  val ItersProp = "graft.ivf.iters"

  private def encodeCents(cents: Array[Array[Double]]): String =
    cents.map(_.mkString(",")).mkString(";")

  private def decodeCents(s: String): Array[Array[Double]] =
    s.split(';').map(_.split(',').map(_.toDouble))

  /** Mean squared distance to the nearest centroid — the quantization
    * error the drift check compares. */
  private def meanErr(sample: Array[Array[Float]], cents: Array[Array[Double]]): Double =
    if (sample.isEmpty) 0.0
    else sample.map { v =>
      cents.map { c =>
        var dd = 0.0; var i = 0
        while (i < c.length) { val t = v(i) - c(i); dd += t * t; i += 1 }
        dd
      }.min
    }.sum / sample.length

  private def fq(catalog: String, namespace: Seq[String], name: String): String =
    (catalog +: namespace :+ name).mkString(".")

  private def lakeTable(
      spark: SparkSession, catalog: String, namespace: Seq[String],
      name: String): graft.catalog.LakehouseTable =
    spark.sessionState.catalogManager.catalog(catalog)
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(namespace.toArray, name))
      .asInstanceOf[graft.catalog.LakehouseTable]

  private def sampleOf(df: DataFrame, sampleN: Int): Array[Array[Float]] =
    df.orderBy(col("vec_id")).limit(sampleN)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray)

  private def setProps(spark: SparkSession, table: String, props: Map[String, String]): Unit =
    spark.sql(s"ALTER TABLE $table SET TBLPROPERTIES (${
      props.map { case (k, v) => s"'$k'='$v'" }.mkString(", ")})")

  /** [[build]] against a LAKEHOUSE source table, persisting the
    * quantizer and covered source version so [[refresh]] can maintain
    * the index incrementally. */
  def create(
      spark: SparkSession,
      catalog: String,
      namespace: Seq[String],
      sourceTable: String,
      indexName: String,
      k: Int = 16,
      sampleN: Int = 2048,
      iters: Int = 3): Array[Array[Double]] = {
    val srcLt = lakeTable(spark, catalog, namespace, sourceTable)
    val srcVersion = graft.catalog.TableMetadata.load(srcLt.tableDir).version
    val index = fq(catalog, namespace, indexName)
    val cents = build(spark, spark.table(fq(catalog, namespace, sourceTable)),
      index, k, sampleN, iters)
    val err = meanErr(sampleOf(spark.table(fq(catalog, namespace, sourceTable)), sampleN), cents)
    setProps(spark, index, Map(
      SourceProp -> sourceTable,
      VersionProp -> srcVersion.toString,
      CentroidsProp -> encodeCents(cents),
      TrainErrProp -> err.toString,
      KProp -> k.toString,
      SampleNProp -> sampleN.toString,
      ItersProp -> iters.toString))
    cents
  }

  /** Fold source appends since the last refresh into the index.
    * Returns "noop" (already current), "incremental" (delta assigned
    * with the stored quantizer — old index files untouched), or "full"
    * (re-trained: non-append source commits, or the delta quantizes
    * worse than `driftFactor` × the training error). */
  def refresh(
      spark: SparkSession,
      catalog: String,
      namespace: Seq[String],
      indexName: String,
      driftFactor: Double = 4.0): String = {
    graft.functions.GraftFunctions.register(spark)
    // loadOrAdopt: a crash in rebuild's DROP→RENAME window leaves only
    // the completed __rebuild staging — adopt it instead of failing
    val idxLt = IndexSwap.loadOrAdopt(spark, catalog, namespace, indexName, VersionProp)
    val props = graft.catalog.TableMetadata.load(idxLt.tableDir).properties
    // validate the full IVF contract up front: a table created via the
    // bare build() path (or any non-index table) gets the descriptive
    // error, not a NoSuchElementException from a random property read
    def prop(p: String): String = props.getOrElse(p,
      throw new IllegalArgumentException(
        s"$indexName is not an IVF index (no $p — created via build() instead of create()?)"))
    val sourceTable = prop(SourceProp)
    val lastVersion = prop(VersionProp).toInt
    val cents = decodeCents(prop(CentroidsProp))
    val trainErr = prop(TrainErrProp).toDouble
    val (k, sampleN, iters) =
      (prop(KProp).toInt, prop(SampleNProp).toInt, prop(ItersProp).toInt)
    val index = fq(catalog, namespace, indexName)

    val srcLt = lakeTable(spark, catalog, namespace, sourceTable)
    val srcVersion = graft.catalog.TableMetadata.load(srcLt.tableDir).version
    if (srcVersion == lastVersion) return "noop"

    def rebuild(): String = {
      // build the replacement under a temp name FIRST: the expensive,
      // failure-prone work (source scan, k-means, partitioned write)
      // completes before the live index is touched, and what remains is
      // two metadata ops. A crash mid-build leaves the live index
      // intact; a crash between drop and rename leaves the fully-built
      // replacement on disk under the temp name.
      val tmpName = indexName + "__rebuild"
      val tmpFq = fq(catalog, namespace, tmpName)
      spark.sql(s"DROP TABLE IF EXISTS $tmpFq")
      create(spark, catalog, namespace, sourceTable, tmpName, k, sampleN, iters)
      spark.sql(s"DROP TABLE $index")
      // v2 RENAME resolves the target inside the source's catalog — the
      // target name must be namespace-qualified only
      spark.sql(s"ALTER TABLE $tmpFq RENAME TO ${(namespace :+ indexName).mkString(".")}")
      "full"
    }

    val delta =
      try Some(graft.catalog.Maintenance.changesBetween(
        spark, catalog, namespace, sourceTable, lastVersion, srcVersion))
      catch {
        // non-append commits in the window: an added-file delta cannot
        // represent removals — rebuild from the current snapshot
        case _: IllegalArgumentException => None
      }
    delta match {
      case None => rebuild()
      case Some(d) =>
        val newSample = sampleOf(d, sampleN)
        if (newSample.nonEmpty &&
            meanErr(newSample, cents) > driftFactor * math.max(trainErr, 1e-12)) {
          // the appended vectors quantize much worse than the training
          // distribution: stale centroids would crowd them into few
          // cells and probes would lose recall — re-train
          rebuild()
        } else {
          if (newSample.nonEmpty) {
            d.select(col("vec_id"), col("embedding"),
                cellOf(col("embedding"), cents).cast("int").as("cell"))
              .createOrReplaceTempView("ivf_delta")
            spark.sql(s"INSERT INTO $index SELECT vec_id, embedding, cell FROM ivf_delta")
          }
          setProps(spark, index, Map(VersionProp -> srcVersion.toString))
          "incremental"
        }
    }
  }

  /** The `nprobe` cells nearest to a query vector (driver-side: k is
    * small by construction). */
  def probeCells(q: Array[Float], cents: Array[Array[Double]], nprobe: Int): Seq[Int] = {
    val dists = cents.zipWithIndex.map { case (c, i) =>
      var dd = 0.0; var j = 0
      while (j < c.length) { val t = q(j) - c(j); dd += t * t; j += 1 }
      (dd, i)
    }
    dists.sortBy(identity).take(nprobe).map(_._2).toSeq
  }

  /** Exact top-k cosine re-rank INSIDE the probed cells: the scan
    * carries `cell IN (...)`, so file skipping prunes every unprobed
    * cell's files before any data is read. */
  def query(
      spark: SparkSession,
      table: String,
      cents: Array[Array[Double]],
      q: Array[Float],
      topK: Int,
      nprobe: Int): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val cells = probeCells(q, cents, nprobe)
    val qv = typedLit(q.toSeq)
    spark.table(table)
      .filter(col("cell").isin(cells: _*))
      .select(col("vec_id"),
        (call_function("vec_dot", qv, col("embedding")) /
          (sqrt(call_function("vec_norm_sq", qv)) *
            sqrt(call_function("vec_norm_sq", col("embedding"))))).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(topK)
  }
}
