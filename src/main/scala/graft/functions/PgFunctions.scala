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
  /** RFC 4122 name-based (v3, md5) UUID from text — uuid-ossp's
    * uuid_generate_v3 shape (reference: utils/adt/uuid.c for the type,
    * contrib uuid-ossp for generation). Deterministic, so bulk surrogate
    * keys are reproducible across engines and re-runs — the property
    * that matters in a pipeline (gen_random_uuid can't be oracle-checked
    * or replayed). Version nibble forced to 3, variant to RFC 10xx. */
  def uuidFromText(c: Column): Column = {
    val h = md5(c.cast("binary"))
    val variantIdx =
      (conv(substring(h, 17, 1), 16, 10).cast("int") % 4) + 1
    val variant = element_at(
      array(lit("8"), lit("9"), lit("a"), lit("b")), variantIdx)
    lower(concat_ws("-",
      substring(h, 1, 8),
      substring(h, 9, 4),
      concat(lit("3"), substring(h, 14, 3)),
      concat(variant, substring(h, 18, 3)),
      substring(h, 21, 12)))
  }

  /** uuid_in validation (uuid.c string_to_uuid, canonical form only). */
  def isUuid(c: Column): Column =
    c.rlike("^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-" +
      "[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$")

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

  /** PG `to_char(numeric, template)` (reference:
    * src/backend/utils/adt/formatting.c NUM_* keywords). Supported
    * template classes: 9/0 digit positions, D or '.' decimal point,
    * G or ',' grouping, sign modes S (anchored +/-), MI (trailing
    * minus-or-blank), PR (angle brackets for negatives), L currency
    * prefix (C-locale '$'), RN/rn Roman numerals, d.ddEEEE scientific
    * notation, and the FM fill-mode modifier. All codegen'd column
    * expressions — no UDF. */
  def toCharNumeric(c: Column, template: String): Column = {
    val fm = template.startsWith("FM")
    val t = template.stripPrefix("FM")
    val up = t.toUpperCase
    if (up == "RN") return romanNumeral(c, toLower = t != "RN", fm = fm)
    if (up.endsWith("EEEE")) return scientific(c, t, fm)
    val hasS = t.contains('S')
    val hasMI = up.endsWith("MI")
    val hasPR = up.endsWith("PR")
    val hasL = up.contains('L')
    val core = t.replaceAll("(?i)(MI|PR)$", "").replaceAll("[SsLl]", "")
    val decimals = {
      val i = core.indexWhere(ch => ch == 'D' || ch == '.')
      if (i < 0) 0 else core.substring(i + 1).count(ch => ch == '9' || ch == '0')
    }
    def magOf(x: Column) =
      if (core.contains('G') || core.contains(',')) format_number(x, decimals)
      else format_string(s"%.${decimals}f", x)
    if (!hasS && !hasMI && !hasPR && !hasL) return magOf(c)
    val cur = if (hasL) concat(lit("$"), magOf(abs(c))) else magOf(abs(c))
    val neg = c < 0
    if (hasS) concat(when(neg, lit("-")).otherwise(lit("+")), cur)
    else if (hasMI)
      concat(cur, when(neg, lit("-")).otherwise(lit(if (fm) "" else " ")))
    else if (hasPR) when(neg, concat(lit("<"), cur, lit(">")))
      .otherwise(if (fm) cur else concat(lit(" "), cur, lit(" ")))
    else concat(when(neg, lit("-")).otherwise(lit("")), cur) // L without sign mode
  }

  /** `RN`/`rn` Roman numerals (formatting.c NUM_RN, values 1–3999);
    * PG right-aligns to width 15 unless FM. */
  private def romanNumeral(c: Column, toLower: Boolean, fm: Boolean): Column = {
    val v = c.cast("int")
    def pick(vals: Seq[String], idx: Column) =
      element_at(array(vals.map(lit): _*), idx.cast("int") + 1)
    val r = concat(
      pick(Seq("", "M", "MM", "MMM"), floor(v / 1000)),
      pick(Seq("", "C", "CC", "CCC", "CD", "D", "DC", "DCC", "DCCC", "CM"),
        pmod(floor(v / 100), lit(10))),
      pick(Seq("", "X", "XX", "XXX", "XL", "L", "LX", "LXX", "LXXX", "XC"),
        pmod(floor(v / 10), lit(10))),
      pick(Seq("", "I", "II", "III", "IV", "V", "VI", "VII", "VIII", "IX"),
        pmod(v, lit(10))))
    val cased = if (toLower) lower(r) else r
    if (fm) cased else lpad(cased, 15, " ")
  }

  /** `d.ddEEEE` scientific notation (formatting.c NUM_E). The mantissa is
    * derived arithmetically (floor-log10 exponent + DECIMAL rounding)
    * rather than printf %e so an independent engine computes the
    * bit-identical string (Java %e rounds HALF_UP, C %e HALF_EVEN). */
  private def scientific(c: Column, t: String, fm: Boolean): Column = {
    val d = {
      val i = t.indexWhere(ch => ch == 'D' || ch == '.')
      if (i < 0) 0
      else t.substring(i + 1).takeWhile(ch => ch == '9' || ch == '0').length
    }
    val ex = floor(log10(abs(c))).cast("int")
    val man = round((c / pow(lit(10.0), ex))
      .cast(org.apache.spark.sql.types.DecimalType(28, 10)), d)
    val body = concat(format_string(s"%.${d}f", man.cast("double")), lit("e"),
      when(ex < 0, lit("-")).otherwise(lit("+")),
      lpad(abs(ex).cast("string"), 2, "0"))
    if (fm) body else concat(when(c < 0, lit("")).otherwise(lit(" ")), body)
  }

  /** PG `to_char(timestamp/date, template)` (reference:
    * src/backend/utils/adt/formatting.c, DCH_* keywords): translates the
    * PG template into a concat of codegen'd date_format/arithmetic parts.
    * Supported: YYYY YY MM DD DDD D HH24 HH12 HH MI SS MS US AM PM Q WW J
    * TZ, name forms Month/Mon/Day/Dy in upper/lower/capitalized case,
    * double-quoted literals, punctuation passthrough, and the FM modifier
    * (suppresses the blank-padding of name fields / zero-padding of the
    * numeric field that follows, per PG "modifies only the specification
    * that follows"). */
  def toChar(ts: Column, template: String): Column = {
    def fmt(p: String) = date_format(ts, p)
    def blankPad(c: Column, w: Int, fm: Boolean) =
      if (fm) c else rpad(c, w, " ")
    def num(c: Column, w: Int, fm: Boolean) =
      if (fm) c.cast("string") else lpad(c.cast("string"), w, "0")
    // (token, fm => column); longest tokens first so HH24 wins over HH
    val tokens: Seq[(String, Boolean => Column)] = Seq(
      "HH24" -> (_ => fmt("HH")),
      "HH12" -> (_ => fmt("hh")),
      "YYYY" -> (fm => num(year(ts), 4, fm)),
      "Month" -> (fm => blankPad(fmt("MMMM"), 9, fm)),
      "MONTH" -> (fm => upper(blankPad(fmt("MMMM"), 9, fm))),
      "month" -> (fm => lower(blankPad(fmt("MMMM"), 9, fm))),
      "Mon" -> (_ => fmt("MMM")),
      "MON" -> (_ => upper(fmt("MMM"))),
      "mon" -> (_ => lower(fmt("MMM"))),
      "Day" -> (fm => blankPad(fmt("EEEE"), 9, fm)),
      "DAY" -> (fm => upper(blankPad(fmt("EEEE"), 9, fm))),
      "day" -> (fm => lower(blankPad(fmt("EEEE"), 9, fm))),
      "Dy" -> (_ => fmt("EEE")),
      "DY" -> (_ => upper(fmt("EEE"))),
      "dy" -> (_ => lower(fmt("EEE"))),
      "DDD" -> (fm => num(dayofyear(ts), 3, fm)),
      "DD" -> (fm => num(dayofmonth(ts), 2, fm)),
      "D" -> (_ => dayofweek(ts).cast("string")), // PG: Sunday = 1
      "MM" -> (fm => num(month(ts), 2, fm)),
      "MI" -> (_ => fmt("mm")),
      "SS" -> (_ => fmt("ss")),
      "MS" -> (_ => fmt("SSS")),
      "US" -> (fm => num(unix_micros(ts) % 1000000L, 6, fm)),
      "AM" -> (_ => fmt("a")),
      "PM" -> (_ => fmt("a")),
      "am" -> (_ => lower(fmt("a"))),
      "pm" -> (_ => lower(fmt("a"))),
      "HH" -> (_ => fmt("hh")),
      "YY" -> (_ => fmt("yy")),
      "Q" -> (_ => quarter(ts).cast("string")),
      // integer week arithmetic (formatting.c): Column `/` is fp-divide,
      // so floor+cast back to int or lpad sees "5.0"
      "WW" -> (fm => num(floor((dayofyear(ts) - 1) / 7).cast("int") + 1, 2, fm)),
      "J" -> (_ => (datediff(ts.cast("date"), to_date(lit("1970-01-01")))
        + 2440588).cast("string")),
      "TZ" -> (_ => lit("UTC")) // session timezone is pinned UTC
    )
    val parts = scala.collection.mutable.ArrayBuffer.empty[Column]
    var i = 0
    var fmNext = false
    while (i < template.length) {
      val rest = template.substring(i)
      if (rest.startsWith("\"")) {
        val end = template.indexOf('"', i + 1)
        val stop = if (end < 0) template.length else end
        parts += lit(template.substring(i + 1, stop))
        i = if (end < 0) template.length else end + 1
      } else if (rest.startsWith("FM")) {
        fmNext = true
        i += 2
      } else tokens.find { case (tok, _) => rest.startsWith(tok) } match {
        case Some((tok, f)) =>
          parts += f(fmNext)
          fmNext = false
          i += tok.length
        case None =>
          parts += lit(rest.head.toString)
          i += 1
      }
    }
    concat(parts.toSeq: _*)
  }

  /** PG `to_number(text, template)` (formatting.c numeric input): the
    * template drives which decorations exist, but parsing only needs to
    * strip them — currency/grouping/space removed, sign from a leading
    * `-`, `<...>` (PR) or trailing `-` (MI). C locale. */
  def toNumber(c: Column, template: String): Column = {
    val neg = c.startsWith("-") || c.startsWith("<") || c.endsWith("-")
    val v = regexp_replace(c, "[^0-9.]", "").cast("double")
    when(neg, -v).otherwise(v)
  }

  /** SQL `(s1, e1) OVERLAPS (s2, e2)` (PG datetime.c): each pair is
    * normalized (start ≤ end), then strict-inequality overlap. */
  def overlaps(s1: Column, e1: Column, s2: Column, e2: Column): Column = {
    val a1 = least(s1, e1); val b1 = greatest(s1, e1)
    val a2 = least(s2, e2); val b2 = greatest(s2, e2)
    a1 < b2 && a2 < b1
  }

  /** PG DCH template → Java time pattern (the input-side counterpart of
    * [[toChar]]'s subset; formatting.c DCH keywords). */
  private def dchToJava(template: String): String = {
    val tokens: Seq[(String, String)] = Seq(
      "HH24" -> "HH", "HH12" -> "hh", "YYYY" -> "yyyy", "Month" -> "MMMM",
      "Mon" -> "MMM", "MM" -> "MM", "DD" -> "dd", "MI" -> "mm",
      "SS" -> "ss", "MS" -> "SSS", "AM" -> "a", "PM" -> "a", "HH" -> "hh",
      "YY" -> "yy")
    val out = new StringBuilder
    var i = 0
    while (i < template.length) {
      val rest = template.substring(i)
      tokens.find { case (tok, _) => rest.startsWith(tok) } match {
        case Some((tok, j)) => out ++= j; i += tok.length
        case None =>
          val ch = template.charAt(i)
          if (ch.isLetter) out ++= s"'$ch'" else out += ch
          i += 1
      }
    }
    out.toString
  }

  /** PG `to_timestamp(text, template)` through the DCH subset. */
  def toTimestampPg(c: Column, template: String): Column =
    to_timestamp(c, dchToJava(template))

  /** PG `to_date(text, template)`. */
  def toDatePg(c: Column, template: String): Column =
    to_date(c, dchToJava(template))

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

  /** PG 14 date_bin (utils/adt/timestamp.c timestamp_bin): floor `ts`
    * into `stepMicros`-wide buckets anchored at `origin`. pmod keeps the
    * floor correct for timestamps before the origin too. */
  def dateBin(stepMicros: Long, ts: Column, origin: Column): Column = {
    val us = unix_micros(ts)
    timestamp_micros(us - pmod(us - unix_micros(origin), lit(stepMicros)))
  }

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
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dotf",
      exprs => graft.expressions.DotFExpr(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "lsh_bucket",
      exprs => graft.expressions.LshBucketExpr(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "arr_eq_count",
      exprs => graft.expressions.ArrEqCountExpr(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "token_entropy",
      exprs => graft.expressions.TokenEntropyExpr(exprs.head),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "porter_stem",
      exprs => graft.expressions.PorterStemExpr(exprs.head),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pii_scan",
      exprs => graft.expressions.PiiScanExpr(exprs.head),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "xpath_nodes",
      exprs => graft.expressions.XPathNodesExpr(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "svec_dot",
      exprs => graft.expressions.SvecDotExpr(
        exprs(0), exprs(1), exprs(2), exprs(3)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sq8_encode",
      exprs => graft.expressions.Sq8EncodeExpr(exprs(0), exprs(1), exprs(2)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sq8_decode",
      exprs => graft.expressions.Sq8DecodeExpr(exprs(0), exprs(1), exprs(2)),
      "built-in")
    // hidden/system-column compatibility (SURVEY §1.5): gp_segment_id →
    // the partition a row is processed in; ctid-ish row address → a
    // per-partition monotonic id. Observability shims, not semantics —
    // values change with repartitioning exactly as segment ids change
    // with redistribution.
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "gp_segment_id",
      _ => org.apache.spark.sql.catalyst.expressions.SparkPartitionID(),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "gp_row_id",
      _ => org.apache.spark.sql.catalyst.expressions.MonotonicallyIncreasingID(),
      "built-in")
    JsonbFunctions.register(spark)
  }
}
