package graft.sources

import graft.QueryDef

/** Deterministic synthetic timeseries generator (SURVEY §2.A A1/A10) — M5. */
object Timeseries {
  val defs: Seq[QueryDef] = Seq.empty
}
