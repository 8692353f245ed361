package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.connector.catalog.Table
import org.apache.spark.sql.connector.write.{RowLevelOperation, RowLevelOperationTable}

/** `private[sql]` doorway #2: recognize the wrapper table Spark's
  * row-level rewrites (RewriteMergeIntoTable / RewriteUpdateTable /
  * RewriteDeleteFromTable) plant around a SupportsRowLevelOperations
  * table. The MorReads rule needs to see through it so the target-side
  * READ of a delta MERGE/UPDATE/DELETE still gets pending
  * merge-on-read deletes folded in; the wrapper class itself is
  * `private[sql]` while both of its components are public API. */
object RowLevelBridge {
  def unwrap(t: Table): Option[(Table, RowLevelOperation)] = t match {
    case r: RowLevelOperationTable => Some((r.table, r.operation))
    case _ => None
  }
}
