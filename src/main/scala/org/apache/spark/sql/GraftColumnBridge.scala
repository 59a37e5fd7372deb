package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression converters — the
  * supported extension-point pattern for libraries that define native
  * Catalyst expressions (Spark 4 moved `new Column(expr)` behind
  * `classic.ExpressionUtils`).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Rebuild a (typically localCheckpoint'ed) frame as a fresh
    * LogicalRDD over its INTERNAL rows: same lineage truncation and
    * fresh attribute ids as the `createDataFrame(df.rdd, df.schema)`
    * idiom the iterative operators used, but without that idiom's two
    * per-row conversions (InternalRow → external Row in `.rdd`, then
    * Row → InternalRow through RowEncoder on every downstream read) —
    * a per-iteration, per-row tax in pageRank/BFS/connected-components
    * that only grows with data size.
    */
  def freshAttributes(df: Dataset[Row]): Dataset[Row] = {
    val cdf = df.asInstanceOf[classic.Dataset[Row]]
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, cdf.schema)
  }
}
