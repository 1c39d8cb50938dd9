package graft.plans

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream,
  DataOutputStream, EOFException, File, FileInputStream, FileOutputStream}

import org.apache.spark.TaskContext
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
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
  * O(keys·k) memory. When the resident-key working set exceeds
  * `spark.graft.topk.maxResidentKeys` (default 2^20), the operator stays
  * spill-safe instead of OOMing: it flushes the k-reduced heap contents
  * as sorted runs to local disk and finishes with a streaming k-way
  * merge — every spilled byte has already been cut to ≤k rows per key,
  * so the spill volume is the OUTPUT size per flush, not the input. At
  * 100 TB ("top 5 documents per domain by quality" over billions of
  * domains) the hash path serves the common case and the merge path
  * bounds the worst case.
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
  * Catalyst inserts the single hash exchange — and NO child ordering.
  * Each task streams its partition once into per-key bounded max-heaps
  * (head = worst kept row; a better row evicts it), then emits the
  * survivors.
  *
  * Spill safety: the per-key heap map is bounded at
  * `spark.graft.topk.maxResidentKeys` keys. Crossing the bound flushes
  * the map — already reduced to ≤k rows per key, so top-k(A∪B) =
  * top-k(top-k(A)∪B) keeps this lossless — as a run sorted by
  * (keys, order) to a local temp file, and the task finishes by k-way
  * merging the runs with the final in-memory state, emitting the first
  * k rows of each key group off the merged stream (O(runs) memory).
  * Grouping keys must be orderable (true for anything Spark itself can
  * sort — which a spilling window/sort dual would require anyway).
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
    val maxResident = conf
      .getConfString("spark.graft.topk.maxResidentKeys", (1 << 20).toString)
      .toInt.max(1)
    child.execute().mapPartitions({ it =>
      val ordering: Ordering[InternalRow] =
        RowOrdering.create(orderLocal, childOutput)
      // run order: keys first (group adjacency after merge), then `order`
      val runOrdering: Ordering[InternalRow] = RowOrdering.create(
        keysLocal.map(SortOrder(_, Ascending)) ++ orderLocal, childOutput)
      val keyProj = UnsafeProjection.create(keysLocal, childOutput)
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      val nFields = childOutput.size
      val heaps = new java.util.HashMap[UnsafeRow,
        scala.collection.mutable.PriorityQueue[InternalRow]]()
      val spills = scala.collection.mutable.ArrayBuffer.empty[File]
      val openStreams =
        scala.collection.mutable.ArrayBuffer.empty[DataInputStream]
      Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] {
        _ =>
          // close before delete: an early-terminated consumer (LIMIT
          // upstream) abandons the merge mid-stream, leaving readers
          // that never reached their EOF-close
          openStreams.foreach(s => try s.close() catch { case _: Exception => () })
          spills.foreach(f => if (f.exists()) f.delete())
      })

      import scala.jdk.CollectionConverters._
      def drainMap(): Array[InternalRow] = {
        val rows = heaps.values().iterator().asScala
          .flatMap(_.iterator).toArray
        heaps.clear()
        java.util.Arrays.sort(rows.asInstanceOf[Array[Object]],
          runOrdering.asInstanceOf[java.util.Comparator[Object]])
        rows
      }
      def spillSortedRun(rows: Array[InternalRow]): Unit = {
        val f = File.createTempFile("graft-topk-", ".run")
        spills += f
        val out = new DataOutputStream(
          new BufferedOutputStream(new FileOutputStream(f), 1 << 16))
        try rows.foreach { r =>
          val u = r match {
            case u: UnsafeRow => u
            case other => toUnsafe(other)
          }
          out.writeInt(u.getSizeInBytes)
          out.write(u.getBytes)
        } finally out.close()
      }
      def runIterator(f: File): Iterator[InternalRow] =
        new Iterator[InternalRow] {
          private val in = new DataInputStream(
            new BufferedInputStream(new FileInputStream(f), 1 << 16))
          openStreams += in
          private var nextRow: UnsafeRow = advance()
          private def advance(): UnsafeRow =
            try {
              val len = in.readInt()
              val bytes = new Array[Byte](len)
              in.readFully(bytes)
              val r = new UnsafeRow(nFields)
              r.pointTo(bytes, len)
              r
            } catch { case _: EOFException => in.close(); null }
          override def hasNext: Boolean = nextRow != null
          override def next(): InternalRow = {
            val r = nextRow; nextRow = advance(); r
          }
        }

      it.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          if (heaps.size() >= maxResident) spillSortedRun(drainMap())
          heap = scala.collection.mutable.PriorityQueue.empty(ordering)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kLocal) heap.enqueue(row.copy())
        else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }

      if (spills.isEmpty) {
        // common case: everything stayed resident — emit heap contents
        heaps.values().iterator().asScala.flatMap(_.iterator)
      } else {
        // k-way merge of the sorted runs + the final in-memory state,
        // then keep the first k rows of each key group off the stream
        val streams = spills.toSeq.map(runIterator) :+
          drainMap().iterator
        val merged = streams.filter(_.hasNext).map(_.buffered) match {
          case Seq() => Iterator.empty
          case ss =>
            val q = new scala.collection.mutable.PriorityQueue[
              scala.collection.BufferedIterator[InternalRow]]()(
              Ordering.by[scala.collection.BufferedIterator[InternalRow],
                InternalRow](_.head)(runOrdering.reverse))
            ss.foreach(q.enqueue(_))
            new Iterator[InternalRow] {
              override def hasNext: Boolean = q.nonEmpty
              override def next(): InternalRow = {
                val s = q.dequeue()
                val r = s.next()
                if (s.hasNext) q.enqueue(s)
                r
              }
            }
        }
        new Iterator[InternalRow] {
          private var curKey: UnsafeRow = null
          private var emitted = 0
          private var pending: InternalRow = fetch()
          @annotation.tailrec
          private def fetch(): InternalRow =
            if (!merged.hasNext) null
            else {
              val r = merged.next()
              val key = keyProj(r)
              if (curKey == null || key != curKey) {
                curKey = key.copy(); emitted = 0
              }
              if (emitted < kLocal) { emitted += 1; r }
              else fetch()
            }
          override def hasNext: Boolean = pending != null
          override def next(): InternalRow = {
            val r = pending; pending = fetch(); r
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}
