package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Varint delta-packing for SORTED long arrays — the shuffle-byte
  * economy layer of the exact co-purchase intersect family
  * (q_graph_jaccard / _capped / q_graph_triangles; r12 verdict item 1).
  *
  * Why: the family's one big shuffle attaches per-node sorted neighbor
  * arrays to each edge row. As `array<long>` every neighbor costs 8
  * bytes plus Spark's UnsafeArrayData header — at the 100× probe that
  * is ~100-130 GB of raw shuffle for ~80-100M edges × two ~80-element
  * arrays, which overflows single-box shuffle scratch (SCALEPROBE r12)
  * and is the network bill on a real cluster. Packed as varints
  * (LEB128: first value absolute, then ascending deltas) a sorted
  * neighbor list costs ~1-3 bytes per neighbor for any locally-dense
  * id space, a ~3-5× cut — strictly better than the int32-cast
  * alternative, which is only 2× and silently IMPOSSIBLE on this
  * repo's own probe corpora (make_probe.py offsets replica ids by
  * k·10⁹, so 100× ids reach ~10¹¹ — far past int32; ANSI mode would
  * error the cast).
  *
  * The intersect then runs DIRECTLY on the packed bytes (merge scan,
  * no decode-to-array materialization): [[PackedIntersectCount]] for
  * the jaccard family's `|N(u)∩N(v)|`, [[PackedIntersectVals]] where
  * the witnesses themselves are needed (triangles). Both are exact
  * twins of `size(array_intersect(a, b))` / `array_intersect(a, b)`
  * on sorted inputs — distinct common values, ascending order —
  * asserted element-for-element by PackedArraySpec, so the DuckDB
  * oracles are unchanged.
  *
  * All three expressions stay inside whole-stage codegen via
  * `nullSafeCodeGen` emitting a static [[PackedOps]] call (the
  * UTF8String-helper pattern) — no interpreted HOF in the per-edge
  * hot path. */
object PackedOps {

  private def varintLen(v: Long): Int = {
    var x = v; var n = 1
    while ((x >>> 7) != 0) { x >>>= 7; n += 1 }
    n
  }

  /** Pack a sorted-ascending long array: LEB128 of the first value,
    * then LEB128 deltas. Unsigned encoding round-trips any long bit
    * pattern; deltas of a sorted array are non-negative so they stay
    * short. Empty array packs to empty bytes. */
  def pack(a: ArrayData): Array[Byte] = {
    val n = a.numElements()
    if (n == 0) return Array.emptyByteArray
    var bytes = 0
    var prev = 0L
    var i = 0
    while (i < n) {
      // fail LOUDLY on a null element (ADVICE r13): the function is
      // session-registered, so arbitrary SQL can reach it with
      // array<bigint> containsNull=true — getLong on a null slot reads
      // garbage and the packed bytes would silently diverge from the
      // array_intersect twin semantics. No production caller packs
      // nulls (sort_array(collect_list(...)) never yields them).
      if (a.isNullAt(i)) throw new IllegalArgumentException(
        s"pack_sorted: null element at position $i - " +
          "packed arrays must be null-free sorted bigint")
      val v = a.getLong(i)
      bytes += varintLen(if (i == 0) v else v - prev)
      prev = v
      i += 1
    }
    val out = new Array[Byte](bytes)
    var p = 0
    prev = 0L
    i = 0
    while (i < n) {
      val v = a.getLong(i)
      var d = if (i == 0) v else v - prev
      prev = v
      while ((d >>> 7) != 0) {
        out(p) = ((d & 0x7fL) | 0x80L).toByte; p += 1; d >>>= 7
      }
      out(p) = d.toByte; p += 1
      i += 1
    }
    out
  }

  /** Streaming decoder over one packed array: `next()` decodes one
    * varint and returns the running (delta-accumulated) value; the
    * first call returns the absolute first element because the
    * accumulator starts at 0 and the first value is encoded as a
    * delta from 0. A final class with two primitive fields — the JIT
    * scalar-replaces the per-call allocation in the merge loops below
    * (escape analysis), so this costs nothing over the hand-inlined
    * decode it replaces while keeping exactly ONE copy of the decode
    * logic. */
  private final class Cursor(b: Array[Byte]) {
    private var p = 0
    private var v = 0L
    def hasNext: Boolean = p < b.length
    def next(): Long = {
      var cur = 0L; var shift = 0; var by = 0
      do { by = b(p); cur |= (by & 0x7fL) << shift; shift += 7; p += 1 }
      while ((by & 0x80) != 0)
      v += cur
      v
    }
  }

  /** |a ∩ b| over two packed sorted arrays, counting DISTINCT common
    * values — exactly `size(array_intersect(a, b))` for sorted inputs
    * (array_intersect de-dups; sorted merge advancing past equal runs
    * does the same). One merge scan. */
  def intersectCount(a: Array[Byte], b: Array[Byte]): Long = {
    if (a.length == 0 || b.length == 0) return 0L
    val ca = new Cursor(a); val cb = new Cursor(b)
    var va = ca.next(); var vb = cb.next()
    var count = 0L
    var last = 0L; var hasLast = false
    while (true) {
      if (va == vb) {
        if (!hasLast || va != last) { count += 1; last = va; hasLast = true }
        if (!ca.hasNext || !cb.hasNext) return count
        va = ca.next(); vb = cb.next()
      } else if (va < vb) {
        if (!ca.hasNext) return count
        va = ca.next()
      } else {
        if (!cb.hasNext) return count
        vb = cb.next()
      }
    }
    count // unreachable; satisfies the type checker after while(true)
  }

  /** a ∩ b over two packed sorted arrays as `array<long>` — distinct
    * common values in ascending order, exactly `array_intersect(a, b)`
    * for sorted inputs (ascending IS first-array order there). */
  def intersectVals(a: Array[Byte], b: Array[Byte]): ArrayData = {
    if (a.length == 0 || b.length == 0)
      return new GenericArrayData(Array.emptyLongArray)
    val ca = new Cursor(a); val cb = new Cursor(b)
    var va = ca.next(); var vb = cb.next()
    var out = new Array[Long](8)
    var n = 0
    var done = false
    while (!done) {
      if (va == vb) {
        if (n == 0 || out(n - 1) != va) {
          if (n == out.length) out = java.util.Arrays.copyOf(out, n * 2)
          out(n) = va; n += 1
        }
        if (!ca.hasNext || !cb.hasNext) done = true
        else { va = ca.next(); vb = cb.next() }
      } else if (va < vb) {
        if (!ca.hasNext) done = true else va = ca.next()
      } else {
        if (!cb.hasNext) done = true else vb = cb.next()
      }
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, n))
  }
}

/** `pack_sorted(array<long>) -> binary` — see [[PackedOps]]. Input
  * MUST be sorted ascending (the callers all pack
  * `sort_array(collect_list(...))`); packing itself round-trips any
  * order, but the intersect twins are only exact on sorted input. */
case class PackSortedLongs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pack_sorted expects array<bigint>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    PackedOps.pack(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PackedOps.pack($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `packed_intersect_count(binary, binary) -> bigint` — merge-scan
  * |a ∩ b| (distinct) directly on packed bytes. */
case class PackedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"packed_intersect_count expects (binary, binary), got " +
        s"${left.dataType}, ${right.dataType}")

  override def nullSafeEval(l: Any, r: Any): Any =
    PackedOps.intersectCount(
      l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.PackedOps.intersectCount($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `packed_intersect(binary, binary) -> array<bigint>` — the common
  * values themselves (triangle witnesses). */
case class PackedIntersectVals(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"packed_intersect expects (binary, binary), got " +
        s"${left.dataType}, ${right.dataType}")

  override def nullSafeEval(l: Any, r: Any): Any =
    PackedOps.intersectVals(
      l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"graft.functions.PackedOps.intersectVals($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-API wrappers (the [[VectorFns.cosineFast]] pattern: session-
  * registered names via `call_function`, so SQL and Column callers hit
  * the same expression). */
object PackedFns {
  def packSorted(a: Column): Column = call_function("pack_sorted", a)
  def packedIntersectCount(a: Column, b: Column): Column =
    call_function("packed_intersect_count", a, b)
  def packedIntersect(a: Column, b: Column): Column =
    call_function("packed_intersect", a, b)
}
