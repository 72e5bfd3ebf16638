package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** TOP-K PER KEY as a first-class operator — SURVEY §7.3 preference
  * tier (c): a custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`
  * for semantics the built-in operators only express wastefully.
  *
  * The built-in formulation (w4_topn_per_group) is
  * `row_number() OVER (PARTITION BY key ORDER BY ...) <= k`: a window
  * that SORTS every partition's full row set to keep k rows of each
  * key. This operator never sorts: each input partition feeds bounded
  * per-key heaps (≤ k rows of state per key — the partial phase), the
  * k survivors shuffle to their key's reducer, and a second heap pass
  * merges them (the final phase). Work is O(n log k) with O(keys·k)
  * state instead of O(n log n) sort; the map-side phase discards
  * everything but k rows per (partition, key) BEFORE the exchange —
  * the same partial/final contract as hash aggregation, applied to
  * an order-statistic the aggregate functions can't express.
  *
  * Memory envelope (stated, not hidden): heap state is O(distinct
  * keys per partition × k) ROWS with no spill fallback — the same
  * class as ObjectHashAggregate before its fallback. That is the
  * right trade when keys × k is executor-bounded (dimension-like
  * grouping cardinality, small k — the top-k reporting shape this
  * operator exists for). For pathological cardinality × k products
  * prefer the window-rank formulation (w4), which sorts but spills;
  * a sort-based fallback here is the known follow-up.
  */
final case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"top-k requires k > 0, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Physical top-k-per-key: one bounded-heap pass per partition.
  * `partial = true` runs map-side (any distribution) and keeps ≤ k
  * rows per key per partition; `partial = false` declares
  * `ClusteredDistribution(keys)` so EnsureRequirements inserts the
  * hash exchange, then merges the partials to the exact per-key top-k.
  */
final case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordering = new LazilyGeneratedOrdering(
        BindReferences.bindReferences(sortOrder, childOutput))
      // head of each heap = the WORST retained row (reverse ordering),
      // so admission is a single O(1) peek + O(log k) replace
      val worstFirst: java.util.Comparator[InternalRow] = ordering.reverse
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          // initial capacity grows on demand — preallocating k slots per
          // key would cost k references per key even for 1-row keys
          heap = new java.util.PriorityQueue[InternalRow](
            math.min(limit, 16), worstFirst)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) heap.add(row.copy())
        else if (ordering.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values.iterator.asScala.flatMap(_.iterator.asScala)
    }, preservesPartitioning = true)
  }
}

/** Plans [[TopKPerKey]] as partial → (exchange via EnsureRequirements)
  * → final. Registered by [[graft.GraftExtensions]] and, belt-and-
  * braces, by [[TopK]] through `experimental.extraStrategies` so the
  * API works on sessions built without the extension.
  */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}
