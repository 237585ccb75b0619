package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (band) join without an equi key.
  *
  * Spark plans a pure inequality join as BroadcastNestedLoop /
  * CartesianProduct — O(n·m) compared work and a broadcast (or worse,
  * replication) of a whole side; at 100 TB that is not a plan, it is an
  * outage. The classic fix (reference analogue: GP/ORCA's band-join
  * preprocessing; same trick as DuckDB's IEJoin prefilter and the
  * Databricks range-join hint): quantize the range dimension into
  * fixed-width bins, explode each interval into the bins it overlaps,
  * tag each point with its bin, equi-join on the bin id, and re-check
  * the exact predicate as a residual filter.
  *
  * Dataflow: one shuffle on the bin key for each side (plain hash
  * partitioning, AQE-coalescible); interval replication factor is
  * ceil(len/binWidth)+1, so `binWidth` near the median interval length
  * keeps the blow-up ≤2× while making each bin's candidate set tiny.
  * Exact results — binning only generates candidates, the residual
  * predicate decides.
  */
object RangeJoin {

  /** Join rows of `points` to rows of `intervals` where
    * `start <= point < end` (all three LONG-valued expressions in the
    * same unit, e.g. epoch days). Output columns: all of `points`' then
    * all of `intervals`'. */
  def pointInInterval(
      points: DataFrame, point: Column,
      intervals: DataFrame, start: Column, end: Column,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__bin", floorDiv(point, binWidth))
    // half-open [start, end): the last candidate bin is the one holding
    // end-1, so intervals never land in a bin past their real extent
    val i = intervals.withColumn("__bin",
      explode(sequence(
        floorDiv(start, binWidth),
        floorDiv(greatest(end - 1, start), binWidth))))
    p.join(i, "__bin")
      .filter(start <= point && point < end)
      .drop("__bin")
  }

  /** Exact integer floor division (pmod keeps it correct for negatives;
    * a double-division floor would lose exactness near 2^53). */
  private def floorDiv(c: Column, w: Long): Column =
    ((c - pmod(c, lit(w))) / w).cast("long")
}
