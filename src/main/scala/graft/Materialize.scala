package graft

import org.apache.spark.sql.DataFrame

/** Eager materialization pin for iterative and DML hot paths (q38's
  * prefix sums, connected components, merge-on-read UPDATE's match
  * set): cut the lineage ONCE so the expensive subplan never runs
  * twice.
  *
  * Default is `localCheckpoint` — executor-local blocks, no extra
  * I/O, the right trade on a single machine or when recompute is
  * acceptable. Its known weakness at cluster scale: a lost executor
  * loses its blocks and fails the job. Setting
  * `graft.checkpoint.reliable=true` (with
  * `sparkContext.setCheckpointDir` configured) switches every pin to
  * a RELIABLE checkpoint: blocks persist to the checkpoint filesystem
  * and survive executor loss — the 1000-executor setting, paying one
  * write+read of the pinned intermediate for fault tolerance.
  *
  * Known limitation (measured): the checkpointed frame reports
  * `UnknownPartitioning`, so a pin does NOT carry hash partitioning
  * across the cut — downstream aggregations and joins on the pinned
  * keys re-shuffle even when the pinned plan ended partitioned on
  * them. Callers must not position a pin to "save" a downstream
  * exchange; pins buy single derivation of a multiply-referenced
  * subtree, nothing else. (`Dataset.persist` would preserve
  * partitioning, but cached entries dedupe across re-invocations of
  * the same plan — benchmark samples would silently measure the
  * cache — and corpus-scale cache residency is the wrong default at
  * 100 TB.) */
object Materialize {

  val ReliableConf = "graft.checkpoint.reliable"

  def pin(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val wantReliable = spark.conf.getOption(ReliableConf).exists(_.toBoolean)
    if (wantReliable) {
      require(spark.sparkContext.getCheckpointDir.isDefined,
        s"$ReliableConf=true needs sparkContext.setCheckpointDir(<fault-tolerant path>)")
      df.checkpoint(eager = true)
    } else df.localCheckpoint(eager = true)
  }

  /** `.pinned` chains where `.localCheckpoint(true)` used to. */
  implicit class PinOps(private val df: DataFrame) extends AnyVal {
    def pinned: DataFrame = pin(df)
  }
}
