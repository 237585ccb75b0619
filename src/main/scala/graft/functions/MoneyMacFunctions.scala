package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** PG `money` (utils/adt/cash.c) and `macaddr` (utils/adt/mac.c)
  * compatibility. Everything is codegen'd Column composition — money is
  * DECIMAL(19,2)-backed (cash.c stores int64 cents; the decimal carries
  * the same exact arithmetic), macaddr is the canonical lowercase
  * colon-separated string (fixed-width, so lexicographic comparison IS
  * byte order, mac.c macaddr_cmp) with 48-bit long bitops behind it.
  */
object MoneyMacFunctions {

  private val MoneyType = DecimalType(19, 2)

  /** cash_in: '$1,234.56', '($12.34)' (accounting negative), '-$5',
    * plain numerics. Unparseable → NULL (PG raises; the set-based
    * engine's try_cast discipline — same divergence note as inet). */
  def moneyIn(c: Column): Column = {
    val neg = c.rlike("^\\s*[-(]") // leading '-' or accounting '('
    val mag = regexp_replace(c, "[^0-9.]", "").cast(MoneyType)
    when(neg, -mag).otherwise(mag)
  }

  /** cash_out: '$1,234.56' / '-$1,234.56' (C-locale grouping). */
  def moneyOut(c: Column): Column =
    when(c.isNull, lit(null).cast("string")).otherwise(
      concat(when(c < 0, lit("-")).otherwise(lit("")),
        lit("$"), format_number(abs(c.cast(MoneyType)), 2)))

  /** macaddr_in (mac.c): accepts 'xx:xx:xx:xx:xx:xx', dashed, dotted
    * 'xxxx.xxxx.xxxx', 'xxxxxx:xxxxxx', and bare 12 hex digits; emits
    * the canonical lowercase colon form. Invalid → NULL. */
  def macIn(c: Column): Column = {
    val hexRaw = lower(regexp_replace(c, "[:\\-\\.\\s]", ""))
    val parts = (0 until 6).map(i => substring(hexRaw, i * 2 + 1, 2))
    when(hexRaw.rlike("^[0-9a-f]{12}$"), concat_ws(":", parts: _*))
      .otherwise(lit(null).cast("string"))
  }

  /** trunc(macaddr): zero the NIC-specific last 3 octets — the OUI
    * prefix survives (mac.c macaddr_trunc). */
  def macTrunc(mac: Column): Column =
    when(mac.isNull, lit(null).cast("string"))
      .otherwise(concat(substring(mac, 1, 9), lit("00:00:00")))

  /** 48-bit numeric value (fits a long) — comparison and bitop base. */
  def macToLong(mac: Column): Column =
    conv(regexp_replace(mac, ":", ""), 16, 10).cast("long")

  /** Canonical macaddr from a 48-bit long. */
  def macFromLong(v: Column): Column =
    macIn(lpad(lower(conv(v, 10, 16)), 12, "0"))

  private val Mask48 = 281474976710655L // 2^48 − 1

  def macAnd(a: Column, b: Column): Column =
    macFromLong(macToLong(a).bitwiseAND(macToLong(b)))
  def macOr(a: Column, b: Column): Column =
    macFromLong(macToLong(a).bitwiseOR(macToLong(b)))
  /** macaddr_not: ~x over the 48-bit space. */
  def macNot(a: Column): Column =
    macFromLong(lit(Mask48) - macToLong(a))

  /** Locally-administered bit (0x02 of the first octet) — the common
    * predicate over synthetic/virtual MACs. */
  def macIsLocal(mac: Column): Column =
    macToLong(mac).bitwiseAND(lit(0x020000000000L)) =!= 0L
}
