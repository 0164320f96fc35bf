package graft.operators

import graft.QueryDef

/** Aggregation family (SURVEY §2.B B14-B20) — filled in M3. */
object Aggregates {
  val defs: Seq[QueryDef] = Seq.empty
}
