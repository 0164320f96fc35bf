package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit SimHash over whitespace tokens: per bit position, the
  * sign of Σ over tokens of (2·bitᵢ(xxhash64(token)) − 1); set bit i when
  * the majority of token hashes have it set.
  *
  * Replaces the explode-600k-tokens → 65-aggregate-columns formulation:
  * one tight loop per ROW (tokens × 64 bit-counters), zero shuffle, and
  * the signature computation fuses into whatever consumes it. Token
  * hashing matches Spark's `xxhash64(token)` (XXH64 over UTF-8 bytes,
  * seed 42), so signatures are identical to the aggregate pipeline's —
  * asserted by LlmOpsSpec.
  *
  * Registered as SQL `simhash64(text)` by [[Functions.registerAll]].
  */
case class SimHash64(child: Expression, seed: Long = 42L)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toLowerCase.toString
    val tokens = text.split(" ", -1)
    val counts = new Array[Int](64)
    var n = 0
    var t = 0
    while (t < tokens.length) {
      val b = tokens(t).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val h = XXH64.hashUnsafeBytes(b,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, seed)
      var i = 0
      while (i < 64) {
        counts(i) += ((h >>> i) & 1L).toInt
        i += 1
      }
      n += 1
      t += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      // matches the aggregate form's majority rule: bit set iff 2·ones > n
      if (counts(i) * 2 > n) sig |= (1L << i)
      i += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def apply(text: Column): Column = call_function("simhash64", text)

  /** Seeded variant — the multi-table near-dup screen derives its k
    * OR-tables from k token-hash seeds (see Dedup.SimHashSeeds). */
  def apply(text: Column, seed: Long): Column =
    call_function("simhash64", text, org.apache.spark.sql.functions.lit(seed))
}
