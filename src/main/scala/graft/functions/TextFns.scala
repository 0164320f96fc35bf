package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text primitives for the dedup / text-analysis operators
  * (SURVEY §2.B B45-B48). Pure column expressions — codegen'd,
  * shuffle-free until an operator explodes/aggregates them. The
  * per-document shingle inner loop lives in the native
  * [[ShingleHashes]] expression; this object holds the composable
  * pieces that are cheap enough as expressions.
  */
object TextFns {

  /** Whitespace tokens of the lowercased text. */
  def tokens(text: Column): Column = split(lower(text), " ")

  /** LSH band signatures: hash of each consecutive `rows`-slice of a
    * minhash signature array; docs sharing any band signature are
    * candidates (see [[graft.operators.Dedup.minhashNearDups]]). */
  def bandSignatures(mh: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(concat_ws(",",
        transform(sequence(lit(1), lit(rows)),
          r => element_at(mh, b * rows + r)))))
}
