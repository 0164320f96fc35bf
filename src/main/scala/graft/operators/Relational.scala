package graft.operators

import graft.QueryDef

/** Filters, projections, joins (SURVEY §2.B B5-B13) — filled in M3. */
object Relational {
  val defs: Seq[QueryDef] = Seq.empty
}
