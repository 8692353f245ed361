package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Q, Relational, TextOps, TpcH, VectorOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2B registers here as a
  * named query; SQL-expressible ones also carry the DuckDB oracle the
  * driver hash-compares against (BASELINE.md t2 gate).
  */
object SparkEntry {

  val allQueries: Seq[Q] = Relational.all ++ TpcH.all ++ TextOps.all ++ VectorOps.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q04.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
