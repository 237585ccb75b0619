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
  /** Order-insensitive exact sum of a double column: sum in decimal,
    * round, return double. Mirrors oracle `CAST(round(sum(CAST(x AS
    * DECIMAL(28,6))), s) AS DOUBLE)`. */
  def dsum(c: Column, scale: Int = 2): Column =
    round(sum(c.cast(DecimalType(28, 6))), scale).cast("double")

  /** Oracle-side fragment matching [[dsum]]. */
  def oSum(expr: String, scale: Int = 2): String =
    s"CAST(round(sum(CAST($expr AS DECIMAL(28,6))), $scale) AS DOUBLE)"

  /** Exact order-insensitive average: decimal sum / count, in double. */
  def davg(c: Column, scale: Int = 4): Column =
    round(sum(c.cast(DecimalType(28, 6))).cast("double") / count(c), scale)

  def oAvg(expr: String, scale: Int = 4): String =
    s"round(CAST(sum(CAST($expr AS DECIMAL(28,6))) AS DOUBLE) / count($expr), $scale)"
}
