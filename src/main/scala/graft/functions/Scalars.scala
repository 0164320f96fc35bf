package graft.functions

import graft.QueryDef

/** Scalar function surface (SURVEY §2.B B29-B35) — filled in M4. */
object Scalars {
  val defs: Seq[QueryDef] = Seq.empty
}
