package graft.tools

/** Dev-only plan capture for plans that never appear in a query's final
  * SELECT (eagerly-executed kernel rounds, write-side plans). Gated on
  * the `graft.capture.writeplan` system property, which only
  * [[ExplainQuery]] sets — zero cost in production/bench paths. */
object PlanCapture {
  private val plans =
    scala.collection.mutable.LinkedHashMap.empty[String, String]

  def enabled: Boolean = sys.props.contains("graft.capture.writeplan")

  /** Record `df`'s formatted plan under `name` (LAST call per name
    * wins — a kernel's first round can legitimately differ while its
    * caches materialize; the steady-state shape is the honest one). */
  def record(name: String, df: org.apache.spark.sql.DataFrame): Unit =
    if (enabled)
      plans(name) = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)

  /** Drain all recorded plans (ExplainQuery writes them per query). */
  def drain(): Seq[(String, String)] = {
    val out = plans.toSeq
    plans.clear()
    out
  }
}
