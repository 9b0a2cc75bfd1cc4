package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into Spark's `private[sql]` Column internals, required on
  * Spark 4.x (where `Column` is ColumnNode-backed and `Column.expr` /
  * `new Column(expr)` are no longer public). This is the established pattern
  * for third-party Catalyst extension libraries: one object inside the
  * `org.apache.spark.sql` package, everything else stays in `graft.*`.
  */
object GraftSqlBridge {
  /** Catalyst expression -> user-facing Column. */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** User-facing Column -> Catalyst expression. */
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** True when the session holds NO cached relations — the cache-lifecycle
    * invariant (graft.CacheScope) asserted by specs after each query.
    */
  def cacheManagerIsEmpty(spark: SparkSession): Boolean =
    spark.asInstanceOf[classic.SparkSession].sharedState.cacheManager.isEmpty
}
