package graft.queries

import graft.Q

/** User-extension surface: UDF, typed Aggregator UDAF, generator/UDTF
  * (SURVEY.md §2B Q40–Q42).
  */
object Extensibility {
  val qs: Seq[Q] = Seq()
}
