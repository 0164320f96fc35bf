package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text primitives for the dedup / text-analysis operators
  * (SURVEY §2.B B45-B48). All pure column expressions — codegen'd,
  * shuffle-free until an operator explodes/aggregates them.
  */
object TextFns {

  /** Whitespace tokens of the lowercased text. */
  def tokens(text: Column): Column = split(lower(text), " ")

  /** Distinct word 3-gram shingles; empty array for texts under 3 tokens.
    * (Callers filter on `size >= 1` — note Spark's `sequence(1, n)` counts
    * DOWN when n < 1, hence the explicit guard here.) */
  def shingles3(text: Column): Column = {
    val ts = tokens(text)
    when(size(ts) < 3, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(1), size(ts) - 2),
        i => concat_ws(" ",
          element_at(ts, i), element_at(ts, i + 1), element_at(ts, i + 2)))))
  }

  /** MinHash signature (reference HOF form): for each of `k` salted hash
    * functions, the min xxhash64 over the shingle set. The production
    * path is the aggregate-shaped variant inside
    * [[graft.operators.Dedup.minhashNearDups]] — same idea, codegen'd. */
  def minhash(shingleSet: Column, k: Int): Column =
    transform(sequence(lit(1), lit(k)),
      j => array_min(transform(shingleSet, x => xxhash64(x, j))))

  /** LSH band signatures: hash of each consecutive `rows`-slice of the
    * minhash signature; docs sharing any band signature are candidates. */
  def bandSignatures(mh: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(concat_ws(",",
        transform(sequence(lit(1), lit(rows)),
          r => element_at(mh, b * rows + r)))))

  /** Exact Jaccard of two distinct-element arrays, in double. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** Word-3-gram shingle IDs as longs: tokens are hashed once, each
    * shingle id is the hash of its token-hash triple. Same equivalence
    * classes as the string shingles in [[shingles3]] (modulo ~1e-11
    * 64-bit collisions), but no per-position string building and no
    * O(n²) `array_distinct` — the hot-path form for dedup at scale
    * (dedupe AFTER explode, distributed, instead). NOT deduplicated. */
  def shingleHashes3(text: Column): Column = {
    val th = transform(tokens(text), t => xxhash64(t))
    when(size(th) < 3, array().cast("array<bigint>"))
      .otherwise(transform(
        sequence(lit(1), size(th) - 2),
        i => xxhash64(element_at(th, i), element_at(th, i + 1),
          element_at(th, i + 2))))
  }
}
