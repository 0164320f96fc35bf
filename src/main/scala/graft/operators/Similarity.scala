package graft.operators

import graft.QueryDef

/** Vector similarity search: brute-force cosine top-k + LSH ANN
  * (SURVEY §2.B B47) — M7. */
object Similarity {
  val defs: Seq[QueryDef] = Seq.empty
}
