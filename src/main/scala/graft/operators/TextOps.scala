package graft.operators

import graft.GQuery

/** LLM-pipeline text operators over the `documents` table (placeholder —
  * filled in this round; see SURVEY.md §7.3 step 4). */
object TextOps {
  val all: Seq[GQuery] = Seq()
}
