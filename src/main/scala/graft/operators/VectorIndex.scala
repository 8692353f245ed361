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
