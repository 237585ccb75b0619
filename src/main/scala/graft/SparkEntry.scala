package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory (SURVEY §2): one named, verifiable
  * query per implemented operator; `oracleSql` holds the DuckDB-equivalent
  * SQL the driver hash-compares against at sf0.01.
  */
object SparkEntry {

  /** All query groups, in SURVEY §2 order. */
  def groups: Seq[Seq[Q]] = Seq(
    RelationalQueries.defs,
    TpchQueries.defs,
    AggregateQueries.defs,
    WindowQueries.defs,
    SubqueryQueries.defs,
    FunctionQueries.defs,
    StorageQueries.defs,
    PipelineQueries.defs,
    ExtensionQueries.defs
  )

  lazy val allQueries: Seq[Q] = groups.flatten

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1 — scan → filter → hash agg (partial/final) → sort. */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.configure(spark)
    queries("q1_agg")(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
