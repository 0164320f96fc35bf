package graft.operators

import graft.QueryDef

/** Tier-A batch surface (SURVEY §2.A A7-A14) — filled in M2. */
object TierA {
  val defs: Seq[QueryDef] = Seq.empty
}
