package graft.queries

import graft.Q

/** LLM-data-pipeline operators: dedup (exact / near-dup), similarity
  * search, text analysis, multimodal columns (SURVEY.md §2B Q30–Q34).
  */
object LlmOps {
  val qs: Seq[Q] = Seq()
}
