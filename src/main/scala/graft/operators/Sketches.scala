package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Probabilistic sketches — MADlib `sketch` module parity (the
  * reference's users run `cmsketch_*` / `fmsketch_dcount` as
  * in-database UDAs on GPDB; methods/sketch in the MADlib tree —
  * Cormode–Muthukrishnan 2005 CountMin, Flajolet–Martin 1985 PCSA).
  * HLL (q_agg_approx_distinct) covers the modern cardinality slot;
  * these are the classic mergeable-sketch APIs the module exposes.
  *
  * Both kernels are DETERMINISTIC md5-hash restatements so a DuckDB
  * replay is bit-identical: every counter/register is exact integer
  * state; the FM estimate's only non-rational factor (2^(s/m)) is
  * split into an exact integer power times a 16-entry table of
  * 17-sig-digit literals embedded identically in both engines.
  *
  * Scale: a CountMin sketch is depth·width counters (256 cells here)
  * regardless of corpus size — the build is ONE map-side-combinable
  * aggregate keyed by (row, bucket), i.e. the shuffle carries at most
  * parallelism·depth·width partial rows, not data. FM is the same
  * shape with m registers. Estimation joins the broadcast sketch.
  */
object Sketches {

  /** CountMin build: (j, b, c) counters, j ∈ [0, depth), b ∈ [0,
    * width). The depth ≤ 4 row hashes are four independent 8-hex-char
    * slices of ONE md5 per key — one digest per row, not depth (the
    * 4× digest cost made the first cut the suite's slowest query;
    * slicing a 128-bit digest is the standard multi-hash derivation).
    * Identical text-space recipe on both engines. */
  /** Hex-suffix length sufficient for `% width`: when width divides
    * 16^k, (v mod width) depends only on v's last k hex digits — so the
    * bucket needs a k-char conv, not the full 8 (r10: conv radix
    * parsing on 2.4M exploded rows was the query's dominant cost; for
    * the 256-wide sketch k = 2 quarters the parsed text). Falls back to
    * the full slice for widths that divide no power of 16 — identical
    * integers either way. */
  private def hexSuffix(width: Int): Int =
    (1 to 8).find(k => (BigInt(16).pow(k) % width) == 0).getOrElse(8)

  def countMin(df: DataFrame, keyCol: String, depth: Int = 4,
      width: Int = 64): DataFrame = {
    require(depth <= 4, "countMin: one md5 supplies at most 4 hash slices")
    val k = hexSuffix(width)
    // repartition the pruned key column up first: the md5+conv map work
    // over an exploded one-row-group source otherwise runs on one core
    KernelCaches.repartitionUp(df.select(col(keyCol)))
      .select(md5(col(keyCol).cast("string")).as("h"))
      .select(explode(sequence(lit(0), lit(depth - 1))).as("j"), col("h"))
      .select(col("j"),
        (conv(col("h").substr(col("j") * 8 + lit(9 - k), lit(k)), 16, 10)
          .cast("long") % width).as("b"))
      .groupBy("j", "b").agg(count(lit(1)).as("c"))
  }

  /** Point-estimate counts for `keys` against a built sketch:
    * est(k) = min_j sketch[j][h_j(k)] (CM never underestimates).
    * The sketch (≤ depth·width rows) broadcasts into the probe. */
  def cmEstimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 64): DataFrame = {
    require(depth <= 4, "cmEstimate: one md5 supplies at most 4 hash slices")
    val k = hexSuffix(width)
    val probes = keys.select(col(keyCol)).distinct()
      .withColumn("h", md5(col(keyCol).cast("string")))
      .select(col(keyCol),
        explode(sequence(lit(0), lit(depth - 1))).as("j"), col("h"))
      .withColumn("b",
        conv(col("h").substr(col("j") * 8 + lit(9 - k), lit(k)), 16, 10)
          .cast("long") % width)
    probes.join(broadcast(sketch), Seq("j", "b"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }

  /** 2^(k/16) for k = 0..15, 17 significant digits — the fractional
    * part of the PCSA estimate's power, tabulated once so both
    * engines multiply identical literals (the ts_rank tabulation
    * discipline: no runtime transcendental ever runs). */
  val pow2Frac16: Seq[String] = Seq(
    "1", "1.0442737824274138", "1.0905077326652577", "1.1387886347566916",
    "1.189207115002721", "1.241857812073484", "1.2968395546510096",
    "1.3542555469368927", "1.4142135623730951", "1.4768261459394993",
    "1.5422108254079407", "1.6104903319492543", "1.681792830507429",
    "1.7562521603732995", "1.8340080864093424", "1.9152065613971474")

  /** m/φ for m=16, φ=0.77351 (FM85's bias constant). */
  val fmScale16 = "20.684929735879301"

  /** FM/PCSA distinct-count sketch, m = 16 registers: register =
    * md5[1..8] mod 16, ρ = 1 + index of lowest set bit of the 48-bit
    * value hash md5[9..20]; bitmap_r = BIT_OR(1 << (ρ−1)); R_r =
    * index of lowest UNSET bit; estimate = (m/φ)·2^(ΣR/m). Returns
    * one row (r_sum, est) with est = exact-integer-power ×
    * [[pow2Frac16]] literal — bit-equal across engines. */
  def fmSketch(df: DataFrame, keyCol: String): DataFrame = {
    val m = 16
    val h = md5(col(keyCol).cast("string"))
    val reg = (conv(substring(h, 1, 8), 16, 10).cast("long") % m).as("r")
    val v = conv(substring(h, 9, 12), 16, 10).cast("long")
    // lowest set bit index, 1-based; v=0 (2^-48 chance) caps at 49
    val rho = when(v === 0L, lit(49))
      .otherwise(bit_count((v.bitwiseAND(-v)) - 1) + 1)
    val bitmaps = df.select(reg,
      call_function("shiftleft", lit(1L), (rho - 1).cast("int")).as("bit"))
      .groupBy("r")
      .agg(bit_or(col("bit")).as("bm"))
    // lowest unset bit index of bm: one-hot t = ~bm & (bm+1)
    val rIdx = bit_count((bitwise_not(col("bm")).bitwiseAND(col("bm") + 1))
      - 1).cast("long")
    val sums = bitmaps.select(rIdx.as("rr"))
      .agg(sum(col("rr")).as("r_sum"))
    val frac = element_at(
      array(pow2Frac16.map(s => expr(s"CAST('$s' AS DOUBLE)")): _*),
      (col("r_sum") % m).cast("int") + 1)
    val intPow = call_function("shiftleft", lit(1L),
      floor(col("r_sum") / m).cast("int")).cast("double")
    sums.select(col("r_sum"),
      round(expr(s"CAST('$fmScale16' AS DOUBLE)") * intPow * frac, 4)
        .as("est"))
  }

  /** Oracle-side SQL fragments mirroring the kernels exactly. */
  object Sql {
    def cmHash(jExpr: String, keyExpr: String, width: Int): String =
      s"CAST(('0x' || substr(md5(CAST($keyExpr AS VARCHAR)), " +
        s"($jExpr) * 8 + 1, 8)) AS BIGINT) % $width"
    def fracLookup(sumExpr: String): String =
      "[" + Sketches.pow2Frac16.map(s => s"CAST('$s' AS DOUBLE)")
        .mkString(", ") + s"][CAST(($sumExpr) % 16 AS INT) + 1]"
  }
}
