package graft.queries

/** LLM-data-pipeline operators (dedup / similarity / text analysis). */
object PipelineQueries {
  val defs: Seq[Q] = Seq()
}
