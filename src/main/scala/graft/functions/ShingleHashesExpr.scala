package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word-n-gram shingle hasher: lowercases, splits on spaces,
  * hashes each token (xxhash64), and emits one 64-bit id per consecutive
  * n-token window — the whole per-document inner loop of the dedup
  * family in ONE expression evaluation per row.
  *
  * Why: the composable form ([[TextFns.shingleHashes3]]) is a nested
  * higher-order `transform`, interpreted per ELEMENT (~330 boxed lambda
  * calls per document). This expression runs a tight JVM loop per ROW;
  * `CodegenFallback` is fine here because the per-row call already
  * amortizes the loop (unlike per-element lambdas).
  *
  * Shingle ids are equality-tokens only (consumers compare them, never
  * invert them), so the exact hash composition doesn't need to match the
  * HOF form — only to be deterministic and collision-resistant.
  * Registered as SQL `shingle_hashes(text, n)` by [[Functions.registerAll]].
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toLowerCase.toString
    // limit -1 keeps trailing empty tokens, matching Spark's split()
    // and DuckDB's string_split token classes exactly
    val tokens = text.split(" ", -1)
    if (tokens.length < n) return new GenericArrayData(Array.emptyLongArray)
    val th = new Array[Long](tokens.length)
    var i = 0
    while (i < tokens.length) {
      val b = tokens(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      th(i) = XXH64.hashUnsafeBytes(b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        b.length, 42L)
      i += 1
    }
    val out = new Array[Long](tokens.length - n + 1)
    var s = 0
    while (s < out.length) {
      var acc = 42L
      var j = 0
      while (j < n) { acc = XXH64.hashLong(th(s + j), acc); j += 1 }
      out(s) = acc
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  /** Column API: `shingle_hashes(text, n)`. */
  def apply(text: Column, n: Int): Column =
    call_function("shingle_hashes", text, org.apache.spark.sql.functions.lit(n))
}
