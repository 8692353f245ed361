package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.physical.Partitioning
import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.{DataFrame, SparkSession => SqlSparkSession}

/** The one `private[sql]` doorway graft uses: rebuild a DataFrame over
  * an already-materialized RDD while DECLARING its physical layout.
  *
  * `Dataset.localCheckpoint`/`checkpoint` wrap the materialized RDD in
  * a [[LogicalRDD]] that reports `UnknownPartitioning` under AQE (the
  * adaptive plan's partitioning is not final when the wrapper is
  * built), so every downstream join/aggregation on the checkpointed
  * keys re-shuffles rows that are already exactly where they need to
  * be. This bridge re-wraps the same RDD with the partitioning the
  * producing plan guaranteed — no data moves, only the plan-level
  * claim changes. The caller owns the claim's truth: the RDD's rows
  * must actually be distributed by that partitioning.
  */
object PartitionedRddBridge {

  def dataFrame(
      spark: SqlSparkSession,
      output: Seq[Attribute],
      rdd: RDD[InternalRow],
      partitioning: Partitioning): DataFrame = {
    val cs = spark.asInstanceOf[SparkSession]
    Dataset.ofRows(cs,
      LogicalRDD(output, rdd, partitioning, Nil, false, None)(cs, None, None))
  }

  /** The materialized InternalRow RDD + output attrs behind a
    * checkpointed Dataset (its analyzed plan is the LogicalRDD). */
  def checkpointedRdd(df: DataFrame): (Seq[Attribute], RDD[InternalRow]) = {
    val lr = df.queryExecution.analyzed.asInstanceOf[LogicalRDD]
    (lr.output, lr.rdd)
  }
}
