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
  *  - FEW groups AND huge NDV (r8, the matrix's last quadrant):
  *    VALUE-RANGE rank selection ([[rangeCont]]/[[rangeDisc]]). One
  *    map-combinable (group, value)→count aggregate, one
  *    range-partition by (group, value) with a per-partition streaming
  *    prefix sum ([[Ranks.cumBelowGrouped]] — only parts × |groups|
  *    totals visit the driver), then the ≤2·|ps| rows whose cumulative
  *    counts straddle the target ranks survive to a
  *    group-cardinality-sized interpolation. No per-group buffer
  *    anywhere, parallelism ∝ value spread, memory bounded at any
  *    group size.
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

  /** (group, value, count, below, group-total) relation backing the
    * value-range regime: a row's value has rank (below+1 … below+count)
    * within its group. */
  private def belowRel(df: DataFrame, g: Column, v: Column): DataFrame = {
    val perKey = df.select(g.as("__g"), v.as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy("__g", "__v").agg(count(lit(1)).as("__c"))
      .cache() // read twice: range-partition sampling + the prefix pass
    KernelCaches.register(perKey)
    Ranks.cumBelowGrouped(perKey, "__g", "__v", "__c")
  }

  /** A rank target `k` lands on this (value, count) run iff
    * below < k ≤ below + count. */
  private def hits(k: Column): Column =
    (col("below") < k) && (k <= col("below") + col("__c"))

  /** percentile_cont in the few-groups × huge-rows regime: exact rank
    * selection over value ranges — same float interpolation as
    * [[exactCont]] (pos = p·(n−1); lo·(1−f)+hi·f), different rank
    * machinery (cumulative counts instead of row_number). */
  def rangeCont(
      df: DataFrame, g: Column, v: Column,
      ps: Seq[(Double, String)]): DataFrame =
    rangeQuantiles(df, g, v, cont = ps, disc = Nil)

  /** percentile_disc, value-range regime: sorted[max(1, ceil(p·n))]. */
  def rangeDisc(
      df: DataFrame, g: Column, v: Column,
      ps: Seq[(Double, String)]): DataFrame =
    rangeQuantiles(df, g, v, cont = Nil, disc = ps)

  /** Mixed cont+disc quantiles over ONE prefix-sum kernel run — the
    * rank machinery is shared, only the target-rank arithmetic differs,
    * so a query wanting both pays one pass, not two. */
  def rangeQuantiles(
      df: DataFrame, g: Column, v: Column,
      cont: Seq[(Double, String)], disc: Seq[(Double, String)]): DataFrame = {
    val rel = belowRel(df, g, v)
    def pos(p: Double): Column = lit(p) * (col("__gtotal") - 1d)
    def kd(p: Double): Column =
      greatest(lit(1L), ceil(lit(p) * col("__gtotal")).cast("long"))
    val needed = (cont.map { case (p, _) =>
      hits(floor(pos(p)).cast("long") + 1L) ||
        hits(ceil(pos(p)).cast("long") + 1L)
    } ++ disc.map { case (p, _) => hits(kd(p)) }).reduce(_ || _)
    val aggs = cont.map { case (p, name) =>
      val vLo = min(when(hits(floor(pos(p)).cast("long") + 1L), col("__v")))
      val vHi = min(when(hits(ceil(pos(p)).cast("long") + 1L), col("__v")))
      val frac = first(pos(p) - floor(pos(p)))
      (vLo * (lit(1d) - frac) + vHi * frac).as(name)
    } ++ disc.map { case (p, name) =>
      min(when(hits(kd(p)), col("__v"))).as(name)
    }
    rel.filter(needed)
      .groupBy(col("__g")).agg(aggs.head, aggs.tail: _*)
      .withColumnRenamed("__g", "__gout")
  }
}
