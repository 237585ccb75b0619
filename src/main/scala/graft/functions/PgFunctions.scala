package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** PostgreSQL/GPDB-semantics scalar functions that Spark lacks or spells
  * differently (reference: src/backend/utils/adt/ — varlena.c,
  * oracle_compat.c, timestamp.c, interpolate.c).
  *
  * Everything here is built from codegen'd `org.apache.spark.sql.functions`
  * so the expressions stay inside whole-stage codegen — no Scala UDF in the
  * hot path.
  */
object PgFunctions {

  /** PG `age(ts1, ts2)`-lite: years/months/days between timestamps as an
    * interval-ish struct (reference: src/backend/utils/adt/timestamp.c). */
  def age(end: Column, start: Column): Column =
    struct(
      floor(months_between(end, start) / 12).cast("int").as("years"),
      (months_between(end, start).cast("int") % 12).as("months"),
      datediff(end, add_months(start, months_between(end, start).cast("int")))
        .as("days"))

  /** PG `linear_interpolate(x, x0, y0, x1, y1)` (reference:
    * src/backend/utils/adt/interpolate.c:1-12): y on the line through
    * (x0,y0),(x1,y1) at abscissa x. */
  def linearInterpolate(x: Column, x0: Column, y0: Column, x1: Column, y1: Column): Column =
    when(x1 === x0, y0)
      .otherwise(y0 + (y1 - y0) * (x - x0) / (x1 - x0))

  /** PG `width_bucket(v, lo, hi, n)` (histogram bucketing). Spark ships
    * width_bucket since 3.1; re-exported for the PG function surface. */
  def widthBucket(v: Column, lo: Column, hi: Column, n: Column): Column =
    width_bucket(v, lo, hi, n)

  /** PG `generate_series(start, stop)` as a Column over arrays —
    * `sequence` + `explode` at call sites; helper for the common case. */
  def generateSeries(start: Column, stop: Column): Column =
    sequence(start, stop)

  /** 1-based array element access (PG arrays are 1-based; reference:
    * src/backend/utils/adt/arrayfuncs.c). Spark element_at is already
    * 1-based — alias kept for the PG surface. */
  def arrayAt(arr: Column, idx: Column): Column = element_at(arr, idx)

  /** PG `to_char(numeric, template)` shim for the common money/number
    * templates (reference: src/backend/utils/adt/formatting.c). Supported
    * template subset: 9/0 digit positions, D or '.' decimal point, G or
    * ',' grouping, optional FM prefix. Grouping → format_number;
    * plain → printf-style %.Nf. */
  def toCharNumeric(c: Column, template: String): Column = {
    val t = template.stripPrefix("FM")
    val decimals = {
      val i = t.indexWhere(ch => ch == 'D' || ch == '.')
      if (i < 0) 0 else t.substring(i + 1).count(ch => ch == '9' || ch == '0')
    }
    if (t.contains('G') || t.contains(','))
      format_number(c, decimals)
    else
      format_string(s"%.${decimals}f", c)
  }

  /** GP hidden column `gp_segment_id` (SURVEY §1.5) — compatibility only:
    * the Spark partition id, a physical (non-deterministic) property. */
  def gpSegmentId(): Column = spark_partition_id()

  /** PG `time`-of-day (SURVEY §1.4: no native Spark time type → micros
    * since midnight as LongType + helpers). */
  def timeOfDayMicros(ts: Column): Column =
    unix_micros(ts) - unix_micros(date_trunc("day", ts))

  /** time-of-day micros back to a 'HH:mm:ss.SSSSSS' display string. */
  def timeOfDayString(todMicros: Column): Column =
    date_format(timestamp_micros(todMicros), "HH:mm:ss.SSSSSS")

  /** Register SQL-callable names for the PG surface. Also covers sessions
    * created without GraftExtensions (e.g. the driver's own session). */
  def registerAll(spark: SparkSession): Unit = {
    spark.udf.register("linear_interpolate",
      (x: Double, x0: Double, y0: Double, x1: Double, y1: Double) =>
        if (x1 == x0) y0 else y0 + (y1 - y0) * (x - x0) / (x1 - x0))
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash32",
      exprs => graft.expressions.SimHash32Expr(exprs.head),
      "built-in")
    JsonbFunctions.register(spark)
  }
}
