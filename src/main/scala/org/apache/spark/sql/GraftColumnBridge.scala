package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge. Spark 4 made the Expression-backed
  * Column constructor private[sql] (`classic.ExpressionUtils`); custom
  * native expressions need this one-file shim inside the package — the
  * usual pattern for Spark extension libraries.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Deterministically free a dataset's storage: cache-manager entries
    * via `unpersist`, plus the underlying RDD blocks of
    * `localCheckpoint`-ed frames (which the cache manager does not
    * track — without this, checkpoint blocks linger until GC).
    */
  def freeStorage(df: Dataset[_]): Unit = {
    df.unpersist()
    df.queryExecution.analyzed.foreach {
      case lr: execution.LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ =>
    }
  }
}
