package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression,
  SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Logical node: the k lowest rows per key under `order` (row_number ≤ k
  * semantics — give `order` a total-order tiebreak for determinism).
  *
  * Why a whole custom operator (SURVEY §7.4 ladder (c)): the
  * window-function formulation `row_number() over (partition by k order
  * by o) <= k` must SORT every partition — O(n log n) per partition and
  * a full materialized sort buffer — to then throw away all but k rows
  * per key. Top-k per key needs neither: after the keyed exchange, a
  * bounded heap per key holds at most k candidates, O(n log k) time and
  * O(keys·k) memory, no sort buffer, no spill pressure. At 100 TB ("top
  * 5 documents per domain by quality" over billions of rows) the absent
  * sort is the difference between a scan-shaped stage and a spill-shaped
  * one.
  */
case class TopKPerKey(k: Int, keys: Seq[Expression], order: Seq[SortOrder],
    child: LogicalPlan) extends UnaryNode {
  require(k >= 1, s"k must be >= 1: $k")
  require(keys.nonEmpty,
    "global top-k has no key to cluster on — use ORDER BY ... LIMIT k " +
      "(TakeOrderedAndProject) instead")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKey =
    copy(child = c)
}

/** Planner strategy mapping the logical node to its physical operator —
  * injected by `GraftExtensions` (injectPlannerStrategy) or via
  * `spark.experimental.extraStrategies`.
  */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(k, keys, order, child) =>
      TopKPerKeyExec(k, keys, order, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Physical operator: requests a keyed (clustered) child distribution —
  * Catalyst inserts the single hash exchange — and NO child ordering
  * (the whole point: no sort). Each task streams its partition once into
  * per-key bounded max-heaps (head = worst kept row; a better row evicts
  * it), then emits the survivors.
  */
case class TopKPerKeyExec(k: Int, keys: Seq[Expression],
    order: Seq[SortOrder], child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val orderLocal = order
    val keysLocal = keys
    val childOutput = child.output
    child.execute().mapPartitions({ it =>
      val ordering: Ordering[InternalRow] =
        org.apache.spark.sql.catalyst.expressions.RowOrdering
          .create(orderLocal, childOutput)
      val keyProj = UnsafeProjection.create(keysLocal, childOutput)
      val heaps = new java.util.HashMap[UnsafeRow,
        scala.collection.mutable.PriorityQueue[InternalRow]]()
      it.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue.empty(ordering)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kLocal) heap.enqueue(row.copy())
        else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}
