package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Registry-free bridge between this library's native Catalyst
  * expressions and the public `Column` API.
  *
  * Spark 4's `Column` wraps a connect-compatible `ColumnNode`, and the
  * classic-backend converters (`ExpressionUtils.column` /
  * `.expression`) are `private[sql]` — so the library surface
  * ([[graft.corpus.Corpus]], the function companions) can offer
  * `jaccard_similarity(colA, colB)` as a plain `Column` WITHOUT
  * requiring `spark.sql.extensions=graft.GraftExtensions` on the
  * session. This object lives under `org.apache.spark.sql` purely to
  * satisfy that access qualifier; it adds no behavior of its own.
  */
object NativeColumn {
  def apply(e: Expression): Column = ExpressionUtils.column(e)
  def expressionOf(c: Column): Expression = ExpressionUtils.expression(c)
}
