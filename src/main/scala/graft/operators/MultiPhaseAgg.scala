package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-phase GROUPING SETS / ROLLUP / CUBE evaluation.
  *
  * Spark's native planning expands every input row once per grouping
  * set (Expand), so an N-set request shuffles N× the base relation.
  * Greenplum instead plans multi-phase aggregation (cdbgroup.c:1-40,
  * nodeAgg.c ROLLUP paths): aggregate once to the finest grouping, then
  * re-aggregate the (tiny) intermediate for every coarser set. At 100 TB
  * the difference is shuffling 3× lineitem vs shuffling lineitem once
  * and re-grouping a few thousand rows.
  *
  * Works for distributive aggregates (count/sum/min/max and anything
  * expressible as merge-of-partials, e.g. the split-sum exact money
  * path). Caveat shared with the one-pass form: a rolled-up key is
  * NULL in the output, indistinguishable from a genuine NULL data key
  * (SQL resolves via grouping(); callers needing that must add a
  * grouping-id partial).
  */
object MultiPhaseAgg {

  /** One aggregate expressed as mergeable phases: `partials` run on base
    * rows grouped by the finest key set; `merges` re-combine partial
    * columns for a coarser set; `out` projects the final value. */
  final case class MAgg(partials: Seq[Column], merges: Seq[Column], out: Column)

  /** count(*) as a mergeable aggregate. */
  def countAll(name: String): MAgg = MAgg(
    Seq(count(lit(1)).as(s"__${name}_c")),
    Seq(coalesce(sum(col(s"__${name}_c")), lit(0L)).as(s"__${name}_c")),
    col(s"__${name}_c").as(name))

  /** min / max as mergeable aggregates. */
  def minOf(c: Column, name: String): MAgg = MAgg(
    Seq(min(c).as(s"__${name}_m")), Seq(min(col(s"__${name}_m")).as(s"__${name}_m")),
    col(s"__${name}_m").as(name))
  def maxOf(c: Column, name: String): MAgg = MAgg(
    Seq(max(c).as(s"__${name}_m")), Seq(max(col(s"__${name}_m")).as(s"__${name}_m")),
    col(s"__${name}_m").as(name))

  /** Exact double sum via the [[graft.queries.Q.dsum]] split-long
    * discipline, mergeable across phases (long sums re-sum exactly). */
  def splitSum(c: Column, name: String, scale: Int = 2): MAgg = {
    val v = floor(c * lit(1000000d) + lit(0.5)).cast("long")
    val hi = floor(v / lit(1000000d)).cast("long")
    val lo = v - hi * lit(1000000L)
    val (hn, ln) = (s"__${name}_hi", s"__${name}_lo")
    MAgg(
      Seq(sum(hi).as(hn), sum(lo).as(ln)),
      Seq(sum(col(hn)).as(hn), sum(col(ln)).as(ln)),
      round((col(hn).cast(org.apache.spark.sql.types.DecimalType(38, 0)) *
        lit(1000000L) + col(ln))
        .cast(org.apache.spark.sql.types.DecimalType(38, 6)) / lit(1000000L),
        scale).cast("double").as(name))
  }

  /** Evaluate `sets` of `keys` over `df` in two phases. Output columns:
    * keys (NULL where rolled up) then each aggregate, matching the SQL
    * GROUPING SETS column convention. */
  def groupingSets(
      df: DataFrame,
      keys: Seq[String],
      sets: Seq[Seq[String]],
      aggs: Seq[MAgg]): DataFrame = {
    require(sets.nonEmpty && aggs.nonEmpty)
    val keyTypes = df.select(keys.map(col): _*).schema
      .fields.map(f => f.name -> f.dataType).toMap
    val partials = aggs.flatMap(_.partials)
    val finest = df.groupBy(keys.map(col): _*)
      .agg(partials.head, partials.tail: _*)
      .cache()
    KernelCaches.register(finest)
    val merges = aggs.flatMap(_.merges)
    val parts = sets.map { set =>
      val grouped =
        (if (set.isEmpty) finest.groupBy()
         else finest.groupBy(set.map(col): _*))
          .agg(merges.head, merges.tail: _*)
      val withKeys = keys.foldLeft(grouped) { (d, k) =>
        if (set.contains(k)) d
        else d.withColumn(k, lit(null).cast(keyTypes(k)))
      }
      withKeys.select(keys.map(col) ++ aggs.map(_.out): _*)
    }
    parts.reduce(_.unionByName(_))
  }

  /** ROLLUP (k1, k2, …) = the prefix sets, finest → (). */
  def rollup(df: DataFrame, keys: Seq[String], aggs: Seq[MAgg]): DataFrame =
    groupingSets(df, keys, keys.indices.reverse.map(i => keys.take(i + 1)) :+ Nil, aggs)

  /** CUBE (k1, k2, …) = all subsets (finest first). */
  def cube(df: DataFrame, keys: Seq[String], aggs: Seq[MAgg]): DataFrame = {
    val subsets = (keys.length to 0 by -1).flatMap(n => keys.combinations(n))
    groupingSets(df, keys, subsets, aggs)
  }
}
