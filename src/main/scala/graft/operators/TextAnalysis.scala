package graft.operators

import graft.QueryDef

/** Text analysis: tokenize, quality scoring, language-ID, fingerprint
  * (SURVEY §2.B B48 + north star) — M7. */
object TextAnalysis {
  val defs: Seq[QueryDef] = Seq.empty
}
