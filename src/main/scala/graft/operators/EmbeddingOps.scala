package graft.operators

import graft.GQuery

/** Similarity-search / ANN operators over the `embeddings` table
  * (placeholder — filled in this round; see SURVEY.md §7.3 step 4). */
object EmbeddingOps {
  val all: Seq[GQuery] = Seq()
}
