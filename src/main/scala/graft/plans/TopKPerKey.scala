package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Custom whole-operator stack (SURVEY §2 escape hatch (c), spark_guide
  * "Custom operator"): per-key bounded top-k.
  *
  * The DataFrame idiom — `row_number().over(partitionBy(k).orderBy(o))`
  * then `filter(rn <= n)` — shuffles EVERY row of every key and sorts
  * full partitions, even though only k rows per key survive. This
  * operator runs in two phases mirroring partial/final aggregation:
  *
  *   scan → [TopKPerKeyExec partial]  (map-side: ≤k rows/key/partition,
  *                                     bounded per-key heaps)
  *        → shuffle on key            (carries ≤k·partitions rows per key,
  *                                     not the full input)
  *        → sort (keys, ordering)     (Spark's spillable external sort,
  *                                     via requiredChildOrdering)
  *        → [TopKPerKeyExec final]    (streaming rank scan, O(1) state)
  *
  * At 100 TB with, say, k=3 and 10⁶ keys, the exchange moves ~k·keys
  * rows per map partition instead of the whole fact table — the same
  * reason map-side combine exists for aggregates. Skewed keys degrade to
  * at most k·partitions rows, bounded regardless of key frequency.
  *
  * Memory posture (both phases bounded):
  *  - the partial phase caps its heap map at `maxPartialKeys` distinct
  *    keys per partition (conf `graft.topk.maxPartialKeys`); rows for
  *    keys beyond the budget pass through unbuffered — the final phase
  *    still filters them, so the cap trades shuffle volume for memory,
  *    never correctness;
  *  - the final phase holds no per-key state at all: it demands
  *    (keys, ordering)-sorted input, which Spark satisfies with its
  *    spillable SortExec, and emits ranks in one streaming pass.
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

/** Physical bounded top-k; `partial` controls the two-phase split. */
final case class TopKPerKeyExec(
    keys: Seq[Attribute],
    ordering: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    partial: Boolean,
    maxPartialKeys: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] =
    if (partial) child.output else child.output :+ rankAttr

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    if (partial) org.apache.spark.sql.catalyst.expressions.AttributeSet.empty
    else org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(keys))

  // the final phase streams over sorted groups; EnsureRequirements plants
  // Spark's spillable SortExec here, so high key cardinality spills to
  // disk instead of growing an in-heap map
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (partial) Seq(Nil)
    else Seq(keys.map(a => SortOrder(a, Ascending)) ++ ordering)

  override def outputOrdering: Seq[SortOrder] =
    if (partial) Nil else keys.map(a => SortOrder(a, Ascending)) ++ ordering

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyIdx = keys.map(a => childOutput.indexWhere(_.exprId == a.exprId)).toArray
    val sortOrders = ordering
    val kk = k

    if (partial) {
      val maxKeys = maxPartialKeys
      child.execute().mapPartitions { iter =>
        // codegen'd comparator over the child row layout
        val cmp = new LazilyGeneratedOrdering(sortOrders, childOutput)
        // per-key bounded heaps: worst row at the head for O(log k) eviction
        val heaps = new java.util.HashMap[InternalRow, java.util.PriorityQueue[InternalRow]]()
        val keyProj = UnsafeProjection.create(keyIdx.map(childOutput), childOutput)
        val reverseCmp = new java.util.Comparator[InternalRow] {
          override def compare(a: InternalRow, b: InternalRow): Int = cmp.compare(b, a)
        }
        val combined = iter.flatMap { row =>
          val key = keyProj(row)
          var heap = heaps.get(key)
          if (heap == null && heaps.size() < maxKeys) {
            heap = new java.util.PriorityQueue[InternalRow](kk + 1, reverseCmp)
            heaps.put(key.copy(), heap)
          }
          if (heap == null) {
            // over the key budget: ship the row as-is; the final phase
            // filters it — memory stays bounded at maxKeys·k rows
            Iterator.single(row)
          } else {
            if (heap.size < kk) heap.add(row.copy())
            else if (cmp.compare(row, heap.peek()) < 0) { heap.poll(); heap.add(row.copy()) }
            Iterator.empty
          }
        }
        // ++ is by-name: the drain runs only after the input is consumed
        combined ++ {
          val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
          heaps.forEach((_, heap) => heap.forEach(r => out += r))
          out.iterator
        }
      }
    } else {
      val rankIsInt = rankAttr.dataType == IntegerType
      child.execute().mapPartitions { iter =>
        val keyProj = UnsafeProjection.create(keyIdx.map(childOutput), childOutput)
        val rankRow = new GenericInternalRow(1)
        val joined = new JoinedRow
        val finalProj = UnsafeProjection.create(
          (childOutput :+ rankAttr).map(_.dataType).toArray)
        var curKey: UnsafeRow = null
        var rank = 0L
        iter.flatMap { row =>
          val key = keyProj(row)
          if (curKey == null || key != curKey) { curKey = key.copy(); rank = 1L }
          else rank += 1L
          if (rank <= kk) {
            // rank type follows the attr: LongType from the public API,
            // IntegerType when substituted for row_number() by the rewrite
            if (rankIsInt) rankRow.setInt(0, rank.toInt) else rankRow.setLong(0, rank)
            Iterator.single(finalProj(joined(row, rankRow)): InternalRow)
          } else Iterator.empty
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Plans [[TopKPerKeyNode]] as partial → (exchange + sort via
  * distribution/ordering requirements) → final. Registered in
  * `Sessions.build`. */
object TopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, ordering, k, rankAttr, child) =>
      val maxPartialKeys = org.apache.spark.sql.internal.SQLConf.get
        .getConfString("graft.topk.maxPartialKeys", "131072").toInt
      val part = TopKPerKeyExec(keys, ordering, k, rankAttr,
        partial = true, maxPartialKeys, planLater(child))
      TopKPerKeyExec(keys, ordering, k, rankAttr,
        partial = false, maxPartialKeys, part) :: Nil
    case _ => Nil
  }
}
