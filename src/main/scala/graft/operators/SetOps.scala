package graft.operators

import graft.QueryDef

/** Sorts, limits, set operations, exact dedup (SURVEY §2.B B24-B28) — M3. */
object SetOps {
  val defs: Seq[QueryDef] = Seq.empty
}
