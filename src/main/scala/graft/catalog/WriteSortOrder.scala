package graft.catalog

import org.apache.spark.sql.types.StructType

/** Declared write sort order — the Iceberg `WRITE ORDERED BY` /
  * `sort-order` table-metadata analogue (reference inherits it through
  * the Iceberg connector it configures, README.md:197,258), carried as
  * a table property:
  *
  * {{{ ALTER TABLE t SET TBLPROPERTIES ('graft.write.sort-order' = 'ts, level') }}}
  *
  * Every INSERT then RANGE-distributes rows across tasks by the sort
  * columns and sorts within each task, so each produced file covers a
  * narrow, disjoint interval of the leading sort column and the footer
  * min/max ranges prune like partition values — the knob that makes a
  * plain (un-partitioned, un-bucketed) 100 TB table range-scannable on
  * its natural query column without the user remembering to pre-sort
  * every write. On a partitioned/hidden-transform table the declared
  * order refines the within-partition sort instead (partition values
  * first, then the declared columns). Compaction re-establishes the
  * order by default, so accumulated unsorted small commits converge
  * back to the clustered layout.
  *
  * Unlike a partition transform the order is advisory layout, not
  * identity: evolving it (SET TBLPROPERTIES again) affects only future
  * writes, and readers need no spec at all — pruning flows entirely
  * from per-file footer stats.
  */
object WriteSortOrder {

  /** Comma-separated column list, outermost sort key first. */
  val Prop = "graft.write.sort-order"

  def colsOf(properties: Map[String, String]): Seq[String] =
    properties.get(Prop).toSeq
      .flatMap(_.split(",").toSeq).map(_.trim).filter(_.nonEmpty)

  /** Fail at CREATE/ALTER time, not first write: every declared sort
    * column must exist in the table schema. */
  def validate(schema: StructType, properties: Map[String, String]): Unit = {
    val known = schema.fieldNames.toSet
    colsOf(properties).foreach { c =>
      if (!known.contains(c))
        throw new IllegalArgumentException(
          s"$Prop references no such column: $c " +
            s"(schema: ${schema.fieldNames.mkString(", ")})")
    }
  }
}
