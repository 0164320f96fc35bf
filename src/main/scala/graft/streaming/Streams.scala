package graft.streaming

import graft.QueryDef

/** Structured Streaming surface (SURVEY §2.B B36-B41) — filled in M6. */
object Streams {
  val defs: Seq[QueryDef] = Seq.empty
}
