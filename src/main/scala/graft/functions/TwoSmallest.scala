package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, CreateNamedStruct, Expression, If, IsNull, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** Declarative aggregate returning the TWO smallest values of its input
  * as `struct<m1, m2>` — `min` and the runner-up in ONE pass with
  * map-side partial aggregation.
  *
  * The pigeonhole dedup engine ([[graft.queries.DedupQueries]]) needs
  * three stats per identical-hash group: size, min id, and the min's
  * own in-group nearest neighbor (the second-smallest id). `min` is a
  * builtin; the runner-up is not — r11 computed it as a window function
  * `min(when(id =!= grp_min, id)) over partitionBy(hash)` stacked on two
  * more windows, which exchanges AND SORTS the full id-level frame,
  * while a separate `groupBy(hash)` recomputed two of the three stats
  * for the distinct-hash frame (r11 verdict: ~1.3 s fixed overhead per
  * query at sf0.1). This aggregate folds everything into one
  * `groupBy(hash).agg(count, two_smallest(id))`: the buffer is the
  * ordered pair (m1 ≤ m2, null = absent), update merges the incoming
  * value as a one-element pair, and merge takes the two smallest of two
  * ordered pairs — `min(max(a1,b1), next-of-smaller-side)` — so partial
  * buffers combine associatively and the shuffle moves one 2-field row
  * per distinct key per map partition instead of the whole frame.
  *
  * MULTISET semantics: duplicated input values count separately, so on
  * input (5, 5, 7) the result is (5, 5) — unlike
  * `min(when(v =!= min_v, v))`'s (5, 7). Identical for DISTINCT inputs,
  * which every caller has (row-unique doc/media ids). Nulls are skipped;
  * empty input yields (null, null); a single value yields (v, null).
  */
case class TwoSmallest(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  override def nullable: Boolean = true
  override def prettyName: String = "two_smallest"
  override def dataType: DataType = StructType(Seq(
    StructField("m1", child.dataType), StructField("m2", child.dataType)))

  override def checkInputDataTypes(): TypeCheckResult =
    TypeUtils.checkForOrderingExpr(child.dataType, prettyName)

  private lazy val m1 = AttributeReference("m1", child.dataType)()
  private lazy val m2 = AttributeReference("m2", child.dataType)()
  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(m1, m2)

  private def nullLit: Expression = Literal.create(null, child.dataType)
  override lazy val initialValues: Seq[Expression] = Seq(nullLit, nullLit)

  /** the two smallest of (a1, a2) ∪ (b1, b2), both pairs ordered with
    * nulls absent-and-last: the smaller head wins slot 1; slot 2 is the
    * lesser of the LOSING head and the winner's own runner-up (the
    * winner's a2/b2 can never beat the loser's b2/a2 without also
    * beating the losing head itself). `least`-style null handling is
    * explicit because Catalyst's LessThan is null-poisoning.
    */
  private def mergePair(a1: Expression, a2: Expression,
      b1: Expression, b2: Expression): Seq[Expression] = {
    def lesser(x: Expression, y: Expression): Expression =
      If(IsNull(x), y, If(IsNull(y), x, If(LessThan(x, y), x, y)))
    val n1 = lesser(a1, b1)
    val n2 = If(IsNull(a1), b2, If(IsNull(b1), a2,
      If(LessThanOrEqual(a1, b1), lesser(a2, b1), lesser(b2, a1))))
    Seq(n1, n2)
  }

  override lazy val updateExpressions: Seq[Expression] =
    mergePair(m1, m2, child, nullLit)

  override lazy val mergeExpressions: Seq[Expression] =
    mergePair(m1.left, m2.left, m1.right, m2.right)

  override lazy val evaluateExpression: Expression =
    CreateNamedStruct(Seq(Literal("m1"), m1, Literal("m2"), m2))

  override protected def withNewChildInternal(newChild: Expression): TwoSmallest =
    copy(child = newChild)
}

object TwoSmallest {
  // usage surface through DESCRIBE FUNCTION — the multiset semantics
  // must be visible to external SQL users, not only in the scaladoc
  val info = new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
    classOf[TwoSmallest].getName, null, "two_smallest",
    "two_smallest(expr) - Aggregate returning the two smallest values " +
      "of expr as struct<m1, m2> in one pass (min and runner-up), with " +
      "map-side partial aggregation.",
    "MULTISET semantics: duplicated values count separately, so on " +
      "(5, 5, 7) the result is (5, 5) — unlike min(x) filtered by " +
      "x <> min. Nulls are skipped; empty input yields (null, null); " +
      "a single value yields (v, null).")

  /** registry-free `Column` form (see [[JaccardSimilarity.apply]]). */
  def apply(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.NativeColumn
    NativeColumn(TwoSmallest(NativeColumn.expressionOf(c)).toAggregateExpression())
  }
}
