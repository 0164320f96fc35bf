package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Mergeable QUANTILE sketch aggregates (B16's fourth mergeable-artifact
  * family: distinct = HLL, frequency = frequent-items, exact distinct =
  * bitmap, quantiles = THIS). Wraps the DataSketches KLL doubles sketch
  * (Karnin/Lang/Liberty, FOCS'16) — the library Spark itself bundles for
  * its HLL functions — as native `TypedImperativeAggregate`s, the same
  * execution shape as Spark's `hll_sketch_agg`/`hll_union_agg` pair:
  * per-segment sketches are bounded state (O(k·log(n/k)) regardless of
  * input volume), merges are associative and rescan-free, and the
  * quantile read runs on the merged driver-sized image. This is the
  * 100 TB per-day-artifact pattern for percentile dashboards: each
  * ingest persists a tiny sketch; any date range is answered by merging
  * sketches, never rescanning the raw data.
  */
object KllFns {
  /** Column API: `kll_sketch_agg(value, k)` → binary sketch image. */
  def sketchAgg(value: Column, k: Int): Column =
    call_function("kll_sketch_agg", value, lit(k))

  /** Column API: `kll_merge_agg(sketch)` → merged binary sketch image. */
  def mergeAgg(sketch: Column): Column = call_function("kll_merge_agg", sketch)

  /** [[mergeAgg]] with an explicit merge-buffer k — required whenever
    * the input sketches were built with k > 200, or the rollup silently
    * caps their accuracy (KLL merges take the smallest k involved). */
  def mergeAgg(sketch: Column, k: Int): Column =
    call_function("kll_merge_agg", sketch, lit(k))

  /** Column API: `kll_quantile(sketch, q)` → estimated quantile. */
  def quantile(sketch: Column, q: Double): Column =
    call_function("kll_quantile", sketch, lit(q))

  private[functions] def heapify(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
}

/** `kll_sketch_agg(value, k)`: accumulate doubles into a KLL sketch,
  * emitted as its compact serialized image (BinaryType) so the result
  * can be persisted as a per-segment artifact and merged later. */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_sketch_agg expects double, got ${child.dataType}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_sketch_agg"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(storageFormat: Array[Byte]): KllDoublesSketch =
    KllFns.heapify(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
}

/** `kll_merge_agg(sketch[, k])`: merge serialized KLL images WITHOUT
  * touching the raw data — the cross-segment rollup leg. The merge
  * takes the SMALLEST k among the inputs AND this buffer (the KLL
  * contract), so `k` — default 200 — must be at least the inputs' k or
  * the rollup silently caps their accuracy; pass the build-side k
  * explicitly when it differs. */
case class KllMergeAgg(
    child: Expression,
    k: Int = 200,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_merge_agg expects binary, got ${child.dataType}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_merge_agg"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.merge(KllFns.heapify(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(storageFormat: Array[Byte]): KllDoublesSketch =
    KllFns.heapify(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
    copy(child = newChild)
}

/** `kll_quantile(sketch, q)`: read an estimated quantile off a serialized
  * KLL image. Runs on group-count-many rows post-aggregation, so
  * CodegenFallback costs nothing measurable. NULL for an empty sketch. */
case class KllQuantile(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_quantile expects (binary, double), got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "kll_quantile"

  override def nullSafeEval(bytes: Any, q: Any): Any = {
    val sk = KllFns.heapify(bytes.asInstanceOf[Array[Byte]])
    if (sk.isEmpty) null else sk.getQuantile(q.asInstanceOf[Double])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantile =
    copy(left = newLeft, right = newRight)
}
