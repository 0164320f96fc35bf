package graft.functions

import graft.QueryDef

/** UDF / UDAF / UDTF exemplars (SURVEY §2.B B42-B44) — filled in M4. */
object Extensions {
  val defs: Seq[QueryDef] = Seq.empty
}
