package graft.operators

import graft.QueryDef

/** Multimodal (binary) column plumbing (SURVEY §2.B B49) — M7. */
object Multimodal {
  val defs: Seq[QueryDef] = Seq.empty
}
