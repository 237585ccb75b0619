package graft.queries

/** Beyond-reference extensions: streaming windows, as-of join, multimodal. */
object ExtensionQueries {
  val defs: Seq[Q] = Seq()
}
