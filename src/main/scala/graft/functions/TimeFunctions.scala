package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PG `time` / `timetz` column surface (reference
  * src/backend/utils/adt/date.c, src/include/utils/date.h:25-34).
  *
  * Spark has no time-of-day type, so the SURVEY §1.4 mapping is typed
  * columns over primitives — exactly the reference's own storage model:
  *
  *  - `time`   = LongType micros since midnight in [0, 86400e6)
  *               (date.h:25 `typedef int64 TimeADT`);
  *  - `timetz` = struct(`t_us` LongType, `zone` IntegerType) where
  *               `zone` is seconds WEST of UTC, i.e. GMT = local + zone
  *               (date.h:29-34 `TimeTzADT`; sign per timetz_cmp_internal
  *               date.c:2206-2218).
  *
  * Everything here is integer micros arithmetic in whole-stage codegen —
  * no UDFs, no timezone library — so the same expressions render 1:1 as
  * the DuckDB oracle SQL and are exact at any scale.
  */
object TimeFunctions {

  val UsPerDay: Long = 86400L * 1000000L
  val UsPerSec: Long = 1000000L

  /** `make_time(h, m, s)` (date.c:1246-1260): seconds may carry a
    * fraction; rounded half-up to micros with floor(x+0.5) (identical
    * IEEE behavior in Spark and DuckDB, unlike round()). */
  def makeTime(h: Column, m: Column, s: Column): Column =
    h.cast("long") * lit(3600L * UsPerSec) +
      m.cast("long") * lit(60L * UsPerSec) +
      floor(s * lit(1000000d) + lit(0.5)).cast("long")

  /** `time` input from 'HH:MM[:SS[.ffffff]]' text (date.c time_in).
    * Missing parts read as zero, like PG. */
  def timeIn(text: Column): Column = {
    val p = split(text, ":")
    val h = get(p, lit(0)).cast("long")
    val m = coalesce(get(p, lit(1)).cast("long"), lit(0L))
    val s = coalesce(get(p, lit(2)).cast("double"), lit(0d))
    makeTime(h, m, s)
  }

  /** time + interval (date.c:1760-1783 time_pl_interval_internal):
    * wraps modulo one day, never negative. */
  def timePlInterval(t: Column, spanMicros: Column): Column =
    pmod(t + spanMicros, lit(UsPerDay))

  /** time - interval (date.c time_mi_interval ≡ plus of the negation). */
  def timeMiInterval(t: Column, spanMicros: Column): Column =
    pmod(t - spanMicros, lit(UsPerDay))

  /** time - time → interval micros (date.c:1741-1757 time_mi_time —
    * plain difference, may be negative; no day wrap). */
  def timeMiTime(t1: Column, t2: Column): Column = t1 - t2

  /** EXTRACT fields from a time value (date.c time_part). `epoch` is
    * seconds-with-fraction; kept here as exact micros (epoch_us) so the
    * cross-engine compare never meets a float. */
  def timePart(t: Column, field: String): Column = field match {
    case "hour"     => floor(t / lit(3600L * UsPerSec)).cast("long")
    case "minute"   => floor(t / lit(60L * UsPerSec)).cast("long") % 60L
    case "second"   => floor(t / lit(UsPerSec)).cast("long") % 60L
    case "microseconds" => // PG: seconds-and-fraction scaled to micros
      t % lit(60L * UsPerSec)
    case "epoch_us" => t
    case other => throw new IllegalArgumentException(
      s"EXTRACT($other FROM time) is not a time field")
  }

  /** PG time_out text: HH:MM:SS with the fractional part trimmed of
    * trailing zeros (EncodeTimeOnly). */
  def timeText(t: Column): Column = {
    val secs = floor(t / lit(UsPerSec)).cast("long")
    val frac = (t % lit(UsPerSec)).cast("long")
    val base = format_string("%02d:%02d:%02d",
      floor(secs / 3600L).cast("long"),
      (floor(secs / 60L) % 60L).cast("long"), secs % 60L)
    val fracStr = when(frac === 0L, lit("")).otherwise(
      concat(lit("."),
        regexp_replace(lpad(frac.cast("string"), 6, "0"), "0+$", "")))
    concat(base, fracStr)
  }

  // ---- timetz --------------------------------------------------------

  /** Construct a timetz from micros-of-day + seconds-west zone. */
  def makeTimeTz(t: Column, zoneWestSecs: Column): Column =
    struct(t.as("t_us"), zoneWestSecs.cast("int").as("zone"))

  /** GMT-equivalent micros — the primary comparison key
    * (date.c:2206-2218: t + zone seconds; ties break on zone, so a
    * total order is (gmt, zone)). Not wrapped: PG compares the raw sum. */
  def timetzGmtMicros(ttz: Column): Column =
    ttz.getField("t_us") + ttz.getField("zone").cast("long") * lit(UsPerSec)

  /** `timetz AT TIME ZONE` with a fixed offset (date.c:2753-2830
    * timetz_zone, fixed-offset branch): local' = local + (zone - zone')
    * wrapped into [0, day); same instant, new zone. */
  def timetzZone(ttz: Column, newZoneWestSecs: Column): Column = {
    val shifted = pmod(
      ttz.getField("t_us") +
        (ttz.getField("zone").cast("long") - newZoneWestSecs.cast("long")) *
          lit(UsPerSec),
      lit(UsPerDay))
    makeTimeTz(shifted, newZoneWestSecs)
  }

  /** `timetz AT TIME ZONE 'Region/City'` (date.c:2753-2830 timetz_zone,
    * named-zone branch). PG resolves the zone's offset with the rules
    * in force on the SESSION'S CURRENT DATE — a timetz has no date, so
    * PG guesses one, and the answer changes across a DST boundary.
    * Deterministic engines can't reproduce "today", so the reference
    * date is an explicit parameter (default 2024-01-15, i.e. standard
    * time in both hemispheres' January rules) — the documented
    * divergence: PG's `now()::date`, graft's pinned `refDate`. The
    * lookup happens ONCE on the driver (java.time zoneinfo, the same
    * IANA database PG reads); rows see a plain fixed-offset shift. */
  def timetzZoneNamed(ttz: Column, zone: String,
      refDate: java.time.LocalDate =
        java.time.LocalDate.of(2024, 1, 15)): Column =
    timetzZone(ttz, lit(zoneNamedWestSecs(zone, refDate)))

  /** Seconds-WEST offset of a named zone at `refDate` (PG's sign
    * convention: west positive). */
  def zoneNamedWestSecs(zone: String,
      refDate: java.time.LocalDate): Int =
    -java.time.ZoneId.of(zone).getRules
      .getOffset(refDate.atStartOfDay(java.time.ZoneId.of(zone))
        .toInstant).getTotalSeconds

  /** timetz + interval wraps the time part, zone unchanged
    * (date.c:1846-1870 timetz_pl_interval). */
  def timetzPlInterval(ttz: Column, spanMicros: Column): Column =
    makeTimeTz(timePlInterval(ttz.getField("t_us"), spanMicros),
      ttz.getField("zone"))

  /** PG timetz_out: time text followed by the DISPLAY offset, which is
    * east-positive = -zone, as ±HH[:MM] with minutes omitted when zero
    * (EncodeTimezone). */
  def timetzText(ttz: Column): Column = {
    val eastSecs = -ttz.getField("zone").cast("long")
    val absSecs = abs(eastSecs)
    val hh = format_string("%02d", floor(absSecs / 3600L).cast("long"))
    val mm = (floor(absSecs / 60L) % 60L).cast("long")
    val sign = when(eastSecs < 0L, lit("-")).otherwise(lit("+"))
    concat(timeText(ttz.getField("t_us")), sign, hh,
      when(mm === 0L, lit("")).otherwise(
        format_string(":%02d", mm)))
  }
}
