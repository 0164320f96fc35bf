package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Vector math over `array<float>` embedding columns, built entirely from
  * codegen'd higher-order functions (SURVEY §2.B B47) — no UDF in the hot
  * path, so whole-stage codegen fuses the fold into the surrounding plan.
  *
  * Elements are cast to double BEFORE the fold: both our oracle (DuckDB)
  * and this code then execute the identical left-to-right IEEE double
  * op sequence, making results reproducible across engines (float32
  * accumulation — what DuckDB's `list_cosine_similarity` does internally
  * — drifts up to ~2e-7, which is visible at round-6 comparisons).
  */
object VectorFns {

  private def d(c: Column): Column = c.cast(DoubleType)

  /** Σ aᵢ·bᵢ with double accumulation, left-to-right. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => d(x) * d(y)), lit(0.0), (acc, v) => acc + v)

  /** Σ aᵢ² with double accumulation. */
  def sumSq(a: Column): Column =
    aggregate(transform(a, x => d(x) * d(x)), lit(0.0), (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(sumSq(a))

  /** Cosine similarity in double precision (HOF reference form). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Cosine similarity via the native codegen'd [[CosineSimilarity]]
    * expression — bit-identical to [[cosine]], ~40× faster on pair scans.
    * Requires [[Functions.registerAll]] (done by `Sessions.build`). */
  def cosineFast(a: Column, b: Column): Column =
    call_function("cosine_sim", a, b)

  /** Native codegen'd dot product (see [[DotProduct]]); combine with
    * precomputed [[l2Norm]]s on pair scans to cut per-pair work 3×. */
  def dotFast(a: Column, b: Column): Column =
    call_function("dot_product", a, b)

  /** The equivalent DuckDB SQL fragments, kept adjacent so query oracles
    * stay in lockstep with the Spark expressions above. */
  object OracleSql {
    def dot(a: String, b: String): String =
      s"list_sum(list_transform(range(1, len($a)+1), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
    def sumSq(a: String): String =
      s"list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    def cosine(a: String, b: String): String =
      s"(${dot(a, b)} / (sqrt(${sumSq(a)}) * sqrt(${sumSq(b)})))"

    /** Prefix-dot over the first `n` dims (an SQL expression), for
      * truncated-dimension scoring (q_embed_matryoshka). Same manual
      * double formula as [[dot]], index-bounded. */
    def dotPrefix(a: String, b: String, n: String): String =
      s"""list_sum(list_transform(range(1, $n + 1),
         |  i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))""".stripMargin

    /** Truncated cosine over the first `n` dims — [[cosine]]'s
      * prefix-sliced twin. */
    def cosinePrefix(a: String, b: String, n: String): String =
      s"""(${dotPrefix(a, b, n)}
         |  / (sqrt(${dotPrefix(a, a, n)})
         |   * sqrt(${dotPrefix(b, b, n)})))""".stripMargin
  }
}
