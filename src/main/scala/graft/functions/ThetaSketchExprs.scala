package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketches, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** THETA sketch aggregate — the set-ALGEBRA member of the mergeable-
  * sketch family (HLL answers only unions; theta's KMV sample supports
  * union, INTERSECTION and difference on the merged images, which is
  * what audience-overlap / cross-segment-reach questions need). Wraps
  * the bundled DataSketches theta Union as a native
  * TypedImperativeAggregate, same execution shape as [[KllSketchAgg]]:
  * bounded state per group (default lgK = 12 ⇒ ≤ 4096 retained
  * hashes), associative rescan-free merges, and the set algebra runs
  * on the driver-sized compact images. With the library's fixed
  * default seed the sketch is a pure function of the input SET —
  * deterministic across runs — but not SQL-expressible, so consumers
  * are spec-gated (tolerance vs exact distinct counts) rather than
  * DuckDB-oracled, the q_sketch_rollup precedent. */
object ThetaFns {
  /** Column API: `theta_sketch_agg(longCol)` → compact sketch image. */
  def sketchAgg(value: Column): Column =
    call_function("theta_sketch_agg", value)

  private[graft] def estimate(bytes: Array[Byte]): Double =
    Sketches.wrapSketch(Memory.wrap(bytes)).getEstimate

  /** Driver-side set algebra over two compact images:
    * (estA, estB, estUnion, estIntersection). */
  private[graft] def overlap(a: Array[Byte], b: Array[Byte])
      : (Double, Double, Double, Double) = {
    val sa = Sketches.wrapSketch(Memory.wrap(a))
    val sb = Sketches.wrapSketch(Memory.wrap(b))
    val un = SetOperation.builder().buildUnion()
    un.union(sa); un.union(sb)
    val it = SetOperation.builder().buildIntersection()
    it.intersect(sa); it.intersect(sb)
    (sa.getEstimate, sb.getEstimate,
      un.getResult.getEstimate, it.getResult.getEstimate)
  }
}

/** `theta_sketch_agg(value)`: accumulate longs into a theta Union,
  * emitted as the compact serialized image (BinaryType). A Union buffer
  * accepts both raw updates and sketch merges, so one buffer type
  * serves the partial and merge phases. */
case class ThetaSketchAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta_sketch_agg expects bigint, got ${child.dataType}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_sketch_agg"

  override def createAggregationBuffer(): Union =
    SetOperation.builder().buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray
  override def deserialize(storageFormat: Array[Byte]): Union = {
    val u = SetOperation.builder().buildUnion()
    u.union(Sketches.wrapSketch(Memory.wrap(storageFormat)))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
}
