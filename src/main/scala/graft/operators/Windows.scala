package graft.operators

import graft.QueryDef

/** Window functions (SURVEY §2.B B21-B23) — filled in M3. */
object Windows {
  val defs: Seq[QueryDef] = Seq.empty
}
