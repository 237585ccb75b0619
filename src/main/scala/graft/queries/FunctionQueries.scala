package graft.queries

/** SURVEY §2.10 scalar function surface. Filled in incrementally. */
object FunctionQueries {
  val defs: Seq[Q] = Seq()
}
