package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused K-way nearest-code argmin for PQ encode — the hot loop of
  * `Similarity.pqModel` (r12 verdict item 4).
  *
  * Replaces the interpreted HOF pipeline
  * `transform(cb, c -> dist2(sv, c.cent))` + `array_min` +
  * `element_at(cb, array_position(...))`: those lambdas evaluate
  * per-element, per-candidate, per-row (~1 µs/step, CodegenFallback),
  * and at K=256 codes × M=16 subspaces the full-corpus ENCODE pass was
  * the 100× probe's #4 cost (330 s). The r10 static
  * `least(struct(...))` unroll measured 4× WORSE (6.4k-node expression
  * leaves whole-stage codegen, allocates a struct per candidate) — the
  * fix that works is this native expression: one fused primitive loop
  * over all K candidates inside whole-stage codegen (the
  * [[CosineSimilarity]] precedent, ~40× on its pair scan).
  *
  * NUMERICS AND TIE-BREAK ARE BIT-IDENTICAL to the HOF form it
  * replaces (PqArgminSpec asserts code-for-code equality): the
  * distance is Σ(x−y)² accumulated left-to-right in doubles (exactly
  * `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0.0, (acc,d) ->
  * acc+d)`), and strict `<` keeps the FIRST minimum — exactly
  * `array_position(scored, array_min(scored))` on a codebook array
  * sorted by cell id (lowest cell wins ties).
  *
  * Input: (subvector `array<double>`, codebook
  * `array<struct<cell: bigint, cent: array<double>>>`).
  * Output: `struct<code: bigint, sqerr: double>` — null if the
  * codebook is empty or no candidate has a matching width (the HOF
  * form yields null sqerr there too). */
object PqOps {
  /** Returns null (no candidate) or a 2-field row (code, sqerr). */
  def argmin(sv: ArrayData, cb: ArrayData): InternalRow = {
    val k = cb.numElements()
    val n = sv.numElements()
    var bestD = Double.PositiveInfinity
    var bestCell = 0L
    var found = false
    var i = 0
    while (i < k) {
      // null-skip a null codebook entry / null cent array (ADVICE r13):
      // the HOF pipeline this expression claims bit-identity with
      // null-scores such candidates and array_min skips them; an NPE
      // here would diverge for SQL callers (pqModel's collect_list-
      // built codebooks never produce nulls, but the function is
      // session-registered).
      val entry = if (cb.isNullAt(i)) null else cb.getStruct(i, 2)
      val cent = if (entry == null || entry.isNullAt(1)) null
                 else entry.getArray(1)
      if (cent != null && cent.numElements() == n) {
        var acc = 0.0
        var j = 0
        while (j < n) {
          val d = sv.getDouble(j) - cent.getDouble(j)
          acc += d * d
          j += 1
        }
        if (acc < bestD) {
          bestD = acc
          bestCell = entry.getLong(0)
          found = true
        }
      }
      i += 1
    }
    if (!found) null
    else new GenericInternalRow(Array[Any](bestCell, bestD))
  }
}

case class PqArgmin(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("code", LongType, nullable = false),
    StructField("sqerr", DoubleType, nullable = false)))

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _),
            ArrayType(StructType(Array(c, v)), _)) =>
        c.dataType == LongType &&
          v.dataType.isInstanceOf[ArrayType] &&
          v.dataType.asInstanceOf[ArrayType].elementType == DoubleType
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "pq_argmin expects (array<double>, " +
        s"array<struct<bigint, array<double>>>), got " +
        s"${left.dataType}, ${right.dataType}")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    PqOps.argmin(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sv, cb) => {
      s"""
         |${ev.value} = graft.functions.PqOps.argmin($sv, $cb);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
