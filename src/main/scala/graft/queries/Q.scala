package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One verifiable query: a Spark implementation plus (where expressible)
  * an equivalent ANSI SQL oracle the driver runs in DuckDB.
  *
  * Contract notes (driver compare):
  *  - output column NAMES must match between Spark and oracle;
  *  - rows are made deterministic with an ORDER BY on both sides;
  *  - double aggregates go through [[Q.dsum]]-style decimal discipline so
  *    both engines compute the identical value regardless of input order
  *    (fp addition is not associative; decimal addition is).
  */
final case class Q(
    name: String,
    oracle: Option[String],
    prepare: Option[(SparkSession, String) => Unit] = None)(
    val query: (SparkSession, String) => DataFrame) {
  /** Full body (fixture writes + query) — the driver-facing contract.
    * Bench runs `prepare` untimed and times only `query`, so fixture
    * setup (partitioned/bucketed copies, DML base tables) doesn't count
    * against query cost. */
  val fn: (SparkSession, String) => DataFrame = (s, d) => {
    prepare.foreach(_(s, d))
    query(s, d)
  }
}

object Q {
  /** Exact, order-insensitive sum of a double column as two LONG sums.
    *
    * Each value is rounded half-up to micros (`floor(x*1e6 + 0.5)` —
    * identical IEEE double math in Spark and DuckDB, unlike a decimal
    * cast whose tie-rounding is engine-specific) and split into
    * units (`hi`) and micro-residue (`lo`); both halves sum in plain
    * 64-bit integers inside whole-stage codegen — ~4× faster than a
    * DECIMAL(28,6) accumulator (which Spark sums via BigDecimal) and
    * still associative/exact, so shuffle order can't change the result.
    *
    * Overflow margins at 100 TB (~7e11 lineitem rows): |lo| < 1e6 →
    * |sum(lo)| < 7e17; |hi| < 1.2e5 (price-scale values) → |sum(hi)| <
    * 8.4e16; both well under 2^63≈9.2e18. The recombine
    * (`hi*1e6 + lo`) runs per GROUP in DECIMAL(38) — exact and free.
    */
  def dsum(c: Column, scale: Int = 2): Column = {
    val v = floor(c * lit(1000000d) + lit(0.5)).cast("long")
    val hi = floor(v / lit(1000000d)).cast("long")
    val lo = v - hi * lit(1000000L)
    round((sum(hi).cast(DecimalType(38, 0)) * lit(1000000L) + sum(lo))
      .cast(DecimalType(38, 6)) / lit(1000000L), scale).cast("double")
  }

  /** Oracle-side fragment matching [[dsum]] (DuckDB: integer sums
    * promote to HUGEINT — exact). */
  def oSum(expr: String, scale: Int = 2): String = {
    val v = s"CAST(floor(($expr) * 1000000 + 0.5) AS BIGINT)"
    val hi = s"CAST(floor($v / 1000000.0) AS BIGINT)"
    val lo = s"($v - $hi * 1000000)"
    s"CAST(round(CAST(sum($hi) * 1000000 + sum($lo) AS DECIMAL(38,6))" +
      s" / 1000000, $scale) AS DOUBLE)"
  }

  /** Exact order-insensitive average: split-sum / count, in double. */
  def davg(c: Column, scale: Int = 4): Column = {
    val v = floor(c * lit(1000000d) + lit(0.5)).cast("long")
    val hi = floor(v / lit(1000000d)).cast("long")
    val lo = v - hi * lit(1000000L)
    round((sum(hi).cast(DecimalType(38, 0)) * lit(1000000L) + sum(lo))
      .cast(DecimalType(38, 6)).cast("double") / lit(1000000d) / count(c),
      scale)
  }

  /** Engine-portable split-sum fragment (valid Spark SQL AND DuckDB —
    * for queries whose Spark side is SQL text, e.g. through the GP
    * dialect). `filter` optionally adds a FILTER (WHERE …) clause to
    * both halves. The hi-sum casts to DECIMAL(38,0) before the ×1e6 so
    * the recombine never overflows BIGINT on either engine. */
  def pSum(expr: String, scale: Int = 2, filter: String = ""): String = {
    val f = if (filter.isEmpty) "" else s" FILTER (WHERE $filter)"
    val v = s"CAST(floor(($expr) * 1000000 + 0.5) AS BIGINT)"
    val hi = s"CAST(floor($v / 1000000.0) AS BIGINT)"
    val lo = s"($v - $hi * 1000000)"
    s"CAST(round(CAST(CAST(sum($hi)$f AS DECIMAL(38,0)) * 1000000 + " +
      s"sum($lo)$f AS DECIMAL(38,6)) / 1000000, $scale) AS DOUBLE)"
  }

  def oAvg(expr: String, scale: Int = 4): String = {
    val v = s"CAST(floor(($expr) * 1000000 + 0.5) AS BIGINT)"
    val hi = s"CAST(floor($v / 1000000.0) AS BIGINT)"
    val lo = s"($v - $hi * 1000000)"
    s"round(CAST(CAST(sum($hi) * 1000000 + sum($lo) AS DECIMAL(38,6))" +
      s" AS DOUBLE) / 1000000 / count($expr), $scale)"
  }
}
