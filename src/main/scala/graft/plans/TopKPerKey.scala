package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** Custom whole-operator stack (SURVEY §2 escape hatch (c), spark_guide
  * "Custom operator"): per-key bounded top-k.
  *
  * The DataFrame idiom — `row_number().over(partitionBy(k).orderBy(o))`
  * then `filter(rn <= n)` — shuffles EVERY row of every key and sorts
  * full partitions, even though only k rows per key survive. This
  * operator keeps a bounded heap per key instead, in two phases mirroring
  * partial/final aggregation:
  *
  *   scan → [TopKPerKeyExec partial]  (map-side: ≤k rows/key/partition)
  *        → shuffle on key            (carries ≤k·partitions rows per key,
  *                                     not the full input)
  *        → [TopKPerKeyExec final]    (merge heaps, emit rank 1..k)
  *
  * At 100 TB with, say, k=3 and 10⁶ keys, the exchange moves ~k·keys
  * rows per map partition instead of the whole fact table — the same
  * reason map-side combine exists for aggregates. Skewed keys degrade to
  * at most k·partitions rows, bounded regardless of key frequency.
  *
  * The logical node is planned by [[TopKStrategy]] (registered through
  * `spark.experimental.extraStrategies` in `Sessions.build`); rank is
  * appended as a LongType column.
  */
final case class TopKPerKeyNode(
    keys: Seq[Attribute],
    ordering: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference, // constructor param: exprId must survive copy()
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output :+ rankAttr
  // rank originates here, not from the child — without this the analyzer
  // flags it as an unresolved reference
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

object TopKPerKeyNode {
  def apply(keys: Seq[Attribute], ordering: Seq[SortOrder], k: Int,
            rankName: String, child: LogicalPlan): TopKPerKeyNode =
    TopKPerKeyNode(keys, ordering, k,
      AttributeReference(rankName, LongType, nullable = false)(), child)
}

/** Physical bounded-heap top-k; `partial` controls the two-phase split. */
final case class TopKPerKeyExec(
    keys: Seq[Attribute],
    ordering: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] =
    if (partial) child.output else child.output :+ rankAttr

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    if (partial) org.apache.spark.sql.catalyst.expressions.AttributeSet.empty
    else org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(keys))

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyIdx = keys.map(a => childOutput.indexWhere(_.exprId == a.exprId)).toArray
    val sortOrders = ordering
    val isPartial = partial
    val kk = k

    child.execute().mapPartitions { iter =>
      // codegen'd comparator over the child row layout
      val cmp = new LazilyGeneratedOrdering(sortOrders, childOutput)
      // per-key bounded heaps: worst row at the head for O(log k) eviction
      val heaps = new java.util.HashMap[InternalRow, java.util.PriorityQueue[InternalRow]]()
      val keyProj = UnsafeProjection.create(keyIdx.map(childOutput), childOutput)
      val reverseCmp = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int = cmp.compare(b, a)
      }
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row).copy()
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kk + 1, reverseCmp)
          heaps.put(key, heap)
        }
        if (heap.size < kk) {
          heap.add(row.copy())
        } else if (cmp.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      if (isPartial) {
        heaps.forEach((_, heap) => heap.forEach(r => out += r))
        out.iterator
      } else {
        val rankRow = new GenericInternalRow(1)
        val joined = new JoinedRow
        val finalProj = UnsafeProjection.create(
          (childOutput :+ rankAttr).map(_.dataType).toArray)
        // rank type follows the attr: LongType from the public API,
        // IntegerType when substituted for row_number() by the rewrite rule
        val rankIsInt = rankAttr.dataType == org.apache.spark.sql.types.IntegerType
        heaps.forEach { (_, heap) =>
          val rows = new java.util.ArrayList[InternalRow](heap)
          rows.sort(cmp)
          var i = 0
          while (i < rows.size()) {
            if (rankIsInt) rankRow.setInt(0, i + 1) else rankRow.setLong(0, i + 1L)
            out += finalProj(joined(rows.get(i), rankRow)).copy()
            i += 1
          }
        }
        out.iterator
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Plans [[TopKPerKeyNode]] as partial → (exchange via distribution
  * requirement) → final. Registered in `Sessions.build`. */
object TopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, ordering, k, rankAttr, child) =>
      val part = TopKPerKeyExec(keys, ordering, k, rankAttr,
        partial = true, planLater(child))
      TopKPerKeyExec(keys, ordering, k, rankAttr,
        partial = false, part) :: Nil
    case _ => Nil
  }
}
