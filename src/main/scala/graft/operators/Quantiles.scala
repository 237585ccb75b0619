package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed quantiles by rank selection (reference
  * utils/adt/orderedsetaggs.c:260-454 percentile_cont/percentile_disc).
  *
  *   1. ONE hash-partition + external sort (window) assigns each row
  *      its in-group rank and group size — bounded memory, spillable;
  *   2. only the ≤ 2·|ps| rows whose ranks straddle the requested
  *      quantiles survive the filter;
  *   3. a group-cardinality-sized final aggregate interpolates.
  *
  * Regime matrix — exact quantiles have no one right plan (measured at
  * sf0.1, both paths kept on purpose):
  *  - MANY groups (per-entity stats): THIS path. Window parallelism ∝
  *    group count; the buffered alternative merges one value→count map
  *    per group through the final aggregate — thousands of maps whose
  *    size grows with per-group NDV, the shape that OOMs an executor
  *    for continuous columns at 100 TB (q_agg_percentile_user).
  *  - FEW groups, modest NDV (q_percentile's 3 return-flags over a
  *    50-value column): the buffered aggregate (`percentile`,
  *    WITHIN GROUP). It partial-aggregates on every core; this path
  *    would collapse to |groups| partitions after the window shuffle —
  *    measured 1.6× slower at 3 groups, arbitrarily bad at 1.
  *  - FEW groups AND huge NDV: neither exact plan is safe; that regime
  *    is multi-pass selection territory, and the practical answer is
  *    approx_percentile (error-gated as the documented 100 TB swap in
  *    OperatorSpec).
  *
  * Interpolation replicates the buffered aggregate's float arithmetic
  * operation-for-operation (0-based pos = p·(n−1), lo·(1−f)+hi·f;
  * disc: sorted[max(1, ceil(p·n))]) so results are bit-identical —
  * asserted in OperatorSpec.
  */
object Quantiles {

  /** percentile_cont for every p in `ps` over `v`, grouped by `g`.
    * Returns one row per group: (g, <outNames...>). Nulls in `v` are
    * excluded, like both reference aggregates. */
  def exactCont(
      df: DataFrame, g: Column, v: Column,
      ps: Seq[(Double, String)]): DataFrame = {
    val ranked = rankAndSize(df, g, v)
    def pos(p: Double): Column = lit(p) * (col("__n") - 1d)
    // rows needed by ANY requested quantile survive; everything else
    // drops before the (tiny) final aggregate
    val needed = ps.map { case (p, _) =>
      (col("__rn") === floor(pos(p)).cast("long") + 1L) ||
        (col("__rn") === ceil(pos(p)).cast("long") + 1L)
    }.reduce(_ || _)
    val aggs = ps.map { case (p, name) =>
      val vLo = min(when(col("__rn") === floor(pos(p)).cast("long") + 1L,
        col("__v")))
      val vHi = min(when(col("__rn") === ceil(pos(p)).cast("long") + 1L,
        col("__v")))
      val frac = first(pos(p) - floor(pos(p)))
      (vLo * (lit(1d) - frac) + vHi * frac).as(name)
    }
    ranked.filter(needed)
      .groupBy(col("__g")).agg(aggs.head, aggs.tail: _*)
      .withColumnRenamed("__g", "__gout")
  }

  /** percentile_disc: smallest value whose cume_dist ≥ p —
    * sorted[max(1, ceil(p·n))]. */
  def exactDisc(
      df: DataFrame, g: Column, v: Column,
      ps: Seq[(Double, String)]): DataFrame = {
    val ranked = rankAndSize(df, g, v)
    val needed = ps.map { case (p, _) =>
      col("__rn") === greatest(lit(1L), ceil(lit(p) * col("__n")).cast("long"))
    }.reduce(_ || _)
    val aggs = ps.map { case (p, name) =>
      min(when(col("__rn") ===
        greatest(lit(1L), ceil(lit(p) * col("__n")).cast("long")),
        col("__v"))).as(name)
    }
    ranked.filter(needed)
      .groupBy(col("__g")).agg(aggs.head, aggs.tail: _*)
      .withColumnRenamed("__g", "__gout")
  }

  /** One window pass: in-group rank by value + group size. Both window
    * specs share the partitioning, so Catalyst plans a single exchange;
    * the sort is external (spillable) — memory stays bounded for any
    * group size. */
  private def rankAndSize(df: DataFrame, g: Column, v: Column): DataFrame =
    df.select(g.as("__g"), v.as("__v"))
      .filter(col("__v").isNotNull)
      .withColumn("__rn",
        row_number().over(Window.partitionBy(col("__g")).orderBy(col("__v"))))
      .withColumn("__n",
        count(lit(1)).over(Window.partitionBy(col("__g"))))
}
