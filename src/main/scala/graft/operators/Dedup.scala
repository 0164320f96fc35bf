package graft.operators

import graft.QueryDef

/** Dedup family: exact, MinHash LSH, SimHash, n-gram Jaccard,
  * embedding-cosine near-dup (SURVEY §2.B B45-B46 + north star) — M7. */
object Dedup {
  val defs: Seq[QueryDef] = Seq.empty
}
