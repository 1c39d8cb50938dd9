package graft.queries

import graft.Q

/** Event-time windows as batch queries + streaming entries
  * (SURVEY.md §2B Q35–Q39).
  */
object EventTime {
  val qs: Seq[Q] = Seq()
}
