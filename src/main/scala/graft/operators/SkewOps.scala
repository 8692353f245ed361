package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins and aggregations.
  *
  * First line of defense at scale is AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default) — it splits
  * oversized SHUFFLE PARTITIONS at runtime. What AQE cannot fix is a
  * single join KEY bigger than an executor: every row of that key still
  * meets every matching build row in one task. Salting fixes that by
  * construction: fan the skewed (stream) side out over `salts`
  * sub-keys and replicate the other (build) side once per salt, so a
  * hot key's work spreads over `salts` tasks at the cost of
  * `salts×` the small side — the standard trade when the small side is
  * broadcastable-ish and the big side has power-law keys.
  */
object SkewOps {

  /** Equi-join `left.key == right.key` with the left side salted.
    * Results are identical to the plain join (inner/left semantics);
    * the salt is derived deterministically from the left row's key and
    * a uniform spread column, never random at execution time. */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"salted join supports inner/left, got $joinType")
    // refuse, don't clobber: withColumn would silently REPLACE a
    // business column named __salt and drop(...) would then remove it
    // from the output
    require(!left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "saltedJoin reserves the column name __salt; rename it on the input first")
    // deterministic per-row salt: hash of the whole left row modulo salts
    val leftCols = left.columns.map(col)
    val salted = left.withColumn("__salt", pmod(xxhash64(leftCols: _*), lit(salts)))
    val replicated = right
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    salted
      .join(replicated, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** Two-phase (partial → final) aggregation for skewed group keys:
    * count/sum-style aggregates compute per (key, salt) first, then
    * combine per key — Spark's hash aggregate already does map-side
    * partial aggregation, so this helper exists for UDAF-style
    * aggregates that don't combine map-side. */
  def saltedSumCount(
      df: DataFrame,
      key: String,
      valueCol: Column,
      salts: Int): DataFrame = {
    require(!df.columns.contains("__salt"),
      "saltedSumCount reserves the column name __salt; rename it on the input first")
    df.withColumn("__salt", pmod(xxhash64(df.columns.map(col): _*), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(valueCol).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as("sum"), sum(col("__pcnt")).as("cnt"))
  }
}
