package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PG interval surface (reference: src/backend/utils/adt/timestamp.c —
  * timestamp_age, interval_justify_hours, interval_justify_days;
  * date.c time arithmetic). Spark has native ANSI year-month / day-time
  * interval types for the arithmetic (`ts + make_interval`, day-time
  * interval * scalar), but no PG `age()` or justify_* — those are built
  * here as pure codegen'd column arithmetic, no UDFs.
  *
  * Everything below assumes micros precision (Spark TimestampType).
  * The symbolic text renderers follow the common PG/DuckDB form
  * `N years N months N days HH:MM:SS[.ffffff]` with zero fields omitted
  * (PG abbreviates "months" as "mons"; we keep the long spelling).
  */
object IntervalFunctions {

  private val DayMicros = 86400000000L

  /** micros-since-midnight of a timestamp. */
  private def tod(ts: Column): Column =
    unix_micros(ts) - unix_micros(date_trunc("day", ts))

  /** PG `age(a, b)` field decomposition for `a >= b` (timestamp_age):
    * per-field differences with borrowing — time borrows a day, days
    * borrow the length of b's month, months borrow a year. Returns
    * (years, months, days, todMicros) columns. */
  def ageParts(a: Column, b: Column): (Column, Column, Column, Column) = {
    val todA = tod(a)
    val todB = tod(b)
    val borrowT = todA < todB
    val t = when(borrowT, todA - todB + DayMicros).otherwise(todA - todB)
    val day0 = dayofmonth(a) - dayofmonth(b) -
      when(borrowT, lit(1)).otherwise(lit(0))
    val borrowD = day0 < 0
    val d = when(borrowD, day0 + dayofmonth(last_day(b))).otherwise(day0)
    val mon0 = month(a) - month(b) - when(borrowD, lit(1)).otherwise(lit(0))
    val borrowM = mon0 < 0
    val m = when(borrowM, mon0 + 12).otherwise(mon0)
    val y = year(a) - year(b) - when(borrowM, lit(1)).otherwise(lit(0))
    (y, m, d, t)
  }

  /** PG `age(a, b)` as a (years, months, days, micros) struct column. */
  def age(a: Column, b: Column): Column = {
    val (y, m, d, t) = ageParts(a, b)
    struct(y.as("years"), m.as("months"), d.as("days"), t.as("micros"))
  }

  /** `N unit[s]` with singular for |n| = 1. */
  private def counted(n: Column, unit: String): Column =
    concat(n.cast("string"), lit(" " + unit),
      when(abs(n) === 1, lit("")).otherwise(lit("s")))

  /** HH:MM:SS[.ffffff] of a micros-of-day value, fraction trimmed of
    * trailing zeros (PG EncodeTimeOnly behavior). */
  private def timeText(todMicros: Column): Column = {
    val secs = floor(todMicros / 1000000L).cast("long")
    val frac = (todMicros % 1000000L).cast("long")
    val hh = lpad(floor(secs / 3600).cast("string"), 2, "0")
    val mi = lpad(floor(secs / 60 % 60).cast("string"), 2, "0")
    val ss = lpad((secs % 60).cast("string"), 2, "0")
    val fracStr = when(frac === 0, lit("")).otherwise(
      concat(lit("."), regexp_replace(lpad(frac.cast("string"), 6, "0"),
        "0+$", "")))
    concat(hh, lit(":"), mi, lit(":"), ss, fracStr)
  }

  /** Symbolic interval text from decomposed fields: zero fields omitted,
    * all-zero renders as `00:00:00` (EncodeInterval, style "postgres"
    * modulo the months spelling). */
  def intervalText(
      y: Column, m: Column, d: Column, todMicros: Column): Column = {
    val allZero = y === 0 && m === 0 && d === 0
    concat_ws(" ",
      when(y =!= 0, counted(y, "year")),
      when(m =!= 0, counted(m, "month")),
      when(d =!= 0, counted(d, "day")),
      when(todMicros =!= 0 || allZero, timeText(todMicros)))
  }

  /** PG `age(a, b)::text` for `a >= b`. */
  def ageText(a: Column, b: Column): Column = {
    val (y, m, d, t) = ageParts(a, b)
    intervalText(y, m, d, t)
  }

  /** Exact timestamp difference as a justified-hours interval text:
    * `D days HH:MM:SS[.ffffff]` — `justify_hours(a - b)` in PG terms
    * (interval_justify_hours folds 24 h chunks into days). */
  def diffJustifyHoursText(a: Column, b: Column): Column = {
    val micros = unix_micros(a) - unix_micros(b)
    val d = floor(micros / DayMicros).cast("long")
    val t = pmod(micros, lit(DayMicros))
    intervalText(lit(0), lit(0), d, t)
  }

  /** PG `justify_days` on a day count: 30-day chunks become months
    * (interval_justify_days). Returns (months, days). */
  def justifyDays(days: Column): (Column, Column) =
    (floor(days / 30).cast("int"), (days % 30).cast("int"))

  /** `extract(epoch from a - b)` truncated to whole seconds. */
  def epochSeconds(a: Column, b: Column): Column =
    floor((unix_micros(a) - unix_micros(b)) / 1000000L).cast("long")
}
