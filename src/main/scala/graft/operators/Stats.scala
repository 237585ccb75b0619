package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distribution hypothesis tests — MADlib's stats module (GP ships
  * `ks_test` / `mw_test` / `chi2_test` as in-database aggregates). The
  * pipeline use case is drift detection: "did this source's value
  * distribution shift between snapshots / splits?".
  */
object Stats {

  /** Two-sample Kolmogorov–Smirnov statistic: D = max_x |F_a(x) −
    * F_b(x)| over the pooled empirical CDFs, plus the location of the
    * max. Returns ONE row: (ks, at_value, n_a, n_b).
    *
    * Scale shape: one (value, group) count aggregate collapses the
    * corpus to distinct values; the two inclusive CDFs come from
    * [[Ranks.cumBelow]] range-partitioned prefix sums (never an
    * unpartitioned window); group totals join in as a broadcast
    * single-row relation. Every CDF value is a ratio of exact longs,
    * so both engines pick the identical argmax (ties → smallest x).
    */
  def ksTest(
      df: DataFrame, valueCol: String, groupCol: String,
      groupA: String, groupB: String): DataFrame = {
    val per = df
      .filter(col(groupCol) === groupA || col(groupCol) === groupB)
      .groupBy(col(valueCol).cast("double").as("x"))
      .agg(
        sum(when(col(groupCol) === groupA, 1L).otherwise(0L)).as("cnt_a"),
        sum(when(col(groupCol) === groupB, 1L).otherwise(0L)).as("cnt_b"))
    val withA = Ranks.cumBelow(per, "x", "cnt_a")
      .withColumnRenamed("below", "below_a")
    val withB = Ranks.cumBelow(withA, "x", "cnt_b")
      .withColumnRenamed("below", "below_b")
    val totals = per.agg(sum(col("cnt_a")).as("n_a"),
      sum(col("cnt_b")).as("n_b"))
    withB.join(broadcast(totals))
      .withColumn("diff", abs(
        (col("below_a") + col("cnt_a")).cast("double")
          / col("n_a").cast("double")
          - (col("below_b") + col("cnt_b")).cast("double")
            / col("n_b").cast("double")))
      .orderBy(col("diff").desc, col("x"))
      .limit(1)
      .select(col("diff").as("ks"), col("x").as("at_value"),
        col("n_a"), col("n_b"))
  }

  /** Mann–Whitney U / Wilcoxon rank-sum (MADlib `mw_test` — the
    * remaining member of the stats module beside ks_test/chi2): with
    * midranks for ties, U_A = ΣR_A − n_A(n_A+1)/2; z uses the
    * tie-corrected variance n_An_B/12·(n+1 − Σ(t³−t)/(n(n−1))).
    * ΣR_A comes from the same per-distinct-value aggregate +
    * [[Ranks.cumBelow]] prefix the AUC uses: per value,
    * 2·ΣR_A = n_As·(2·below + cnt + 1) — exact integers end to end
    * (DECIMAL(38): rank sums pass 2^63 at scale), so U and every
    * variance term are identical exact ints and z is a pinned double.
    * Returns (n_a, n_b, u_a, z). */
  def mwTest(
      df: DataFrame, valueCol: String, groupCol: String,
      groupA: String, groupB: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val per = df
      .filter(col(groupCol) === groupA || col(groupCol) === groupB)
      .groupBy(col(valueCol).cast("double").as("x"))
      .agg(count(lit(1)).as("cnt"),
        sum(when(col(groupCol) === groupA, 1L).otherwise(0L)).as("na_s"))
    // na_s casts to DECIMAL(38) BEFORE the multiply (the kendallTauB
    // discipline): a Long product would silently overflow past 2^63 at
    // the large-n/heavy-ties scale while the oracle multiplies HUGEINTs
    val agg = Ranks.cumBelow(per, "x", "cnt")
      .agg(
        sum(col("na_s").cast(dec)
          * (lit(2) * col("below") + col("cnt") + 1).cast(dec))
          .as("two_rsum"),
        sum(col("na_s")).as("na"),
        sum(col("cnt") - col("na_s")).as("nb"),
        sum((col("cnt").cast(dec) * col("cnt").cast(dec)
          * col("cnt").cast(dec) - col("cnt").cast(dec)))
          .as("tie3"))
    agg.select(
      col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
      (col("two_rsum").cast("double") / 2.0
        - col("na").cast("double") * (col("na").cast("double") + 1.0)
          / 2.0).as("u_a"),
      col("tie3").cast("double").as("t3"))
      .select(col("n_a"), col("n_b"), col("u_a"),
        ((col("u_a") - col("n_a").cast("double") * col("n_b").cast("double")
          / 2.0) /
          sqrt(col("n_a").cast("double") * col("n_b").cast("double")
            / 12.0 *
            ((col("n_a") + col("n_b")).cast("double") + 1.0
              - col("t3") /
                ((col("n_a") + col("n_b")).cast("double") *
                  ((col("n_a") + col("n_b")).cast("double") - 1.0)))))
          .as("z"))
  }

  /** Wilcoxon signed-rank test (MADlib `wsr_test`): paired
    * differences d = x − y per row; zeros drop (the standard
    * convention), |d| ranks with midranks for ties, W⁺ = Σ ranks of
    * positive d. z = (W⁺ − n(n+1)/4) / √(n(n+1)(2n+1)/24 − Σ(t³−t)/48)
    * with the tie correction. Rank sums ride the same
    * per-distinct-|d| aggregate + [[Ranks.cumBelow]] prefix as
    * [[mwTest]] — exact DECIMAL(38) integers end to end, z a pinned
    * double. Returns (n, w_plus, z). */
  def wsrTest(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val d = df.select(
      (col(xCol).cast("double") - col(yCol).cast("double")).as("d"))
      .filter(col("d") =!= 0.0)
    val per = d.groupBy(abs(col("d")).as("ad"))
      .agg(count(lit(1)).as("cnt"),
        sum(when(col("d") > 0, 1L).otherwise(0L)).as("np_s"))
    // np_s → DECIMAL(38) before the multiply, as in [[mwTest]]
    val agg = Ranks.cumBelow(per, "ad", "cnt")
      .agg(
        sum(col("np_s").cast(dec)
          * (lit(2) * col("below") + col("cnt") + 1).cast(dec))
          .as("two_wsum"),
        sum(col("cnt")).as("n"),
        sum((col("cnt").cast(dec) * col("cnt").cast(dec)
          * col("cnt").cast(dec) - col("cnt").cast(dec))).as("tie3"))
    agg.select(col("n").cast("long").as("n"),
      (col("two_wsum").cast("double") / 2.0).as("w_plus"),
      col("n").cast("double").as("nd"),
      col("tie3").cast("double").as("t3"))
      .select(col("n"), col("w_plus"),
        ((col("w_plus") - col("nd") * (col("nd") + 1.0) / 4.0) /
          sqrt(col("nd") * (col("nd") + 1.0) * (col("nd") * 2.0 + 1.0)
            / 24.0 - col("t3") / 48.0)).as("z"))
  }

  /** Kendall τ-b (the tie-corrected concordance coefficient — the
    * third member of the correlation family beside Pearson q_ml_corr
    * and Spearman): computed from the CONTINGENCY TABLE, never row
    * pairs — C and D are sums of n_a·n_b over ordered CELL pairs, so
    * the quadratic work is |X|·|Y| cells squared (discrete/binned
    * features; continuous callers bin first — the histogram-method
    * contract trees already use). One corpus aggregate builds the
    * cells; everything after is cell-scale.
    *
    * All counts and pair sums are exact integers in DECIMAL(38)
    * (C ~ n²/4 passes 2^63 at scale); the final
    * τ = (C−D)/√((n0−n1)(n0−n2)) converts each exact integer to
    * double separately with a pinned multiply order, so both engines
    * emit the identical double. Returns (n, c, d, tau). */
  def kendallTauB(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    // the cell relation feeds four consumers (pairs, both marginals,
    // totals) — lineage-cut so the corpus is scanned ONCE and the
    // cell-scale result is what recirculates
    val cells = df.groupBy(col(xCol).cast("double").as("x"),
      col(yCol).cast("double").as("y"))
      .agg(count(lit(1)).as("nc"))
      .localCheckpoint(true)
    val a = cells.select(col("x").as("xa"), col("y").as("ya"),
      col("nc").as("na"))
    val b = cells.select(col("x").as("xb"), col("y").as("yb"),
      col("nc").as("nb"))
    val dec = DecimalType(38, 0)
    val pairs = a.join(broadcast(b), col("xa") < col("xb"))
      .select(
        when(col("ya") < col("yb"),
          col("na").cast(dec) * col("nb").cast(dec))
          .otherwise(lit(0).cast(dec)).as("cterm"),
        when(col("ya") > col("yb"),
          col("na").cast(dec) * col("nb").cast(dec))
          .otherwise(lit(0).cast(dec)).as("dterm"))
      .agg(sum(col("cterm")).as("c"), sum(col("dterm")).as("d"))
    val margX = cells.groupBy("x").agg(sum(col("nc")).as("tx"))
      .agg(sum(col("tx").cast(dec) * (col("tx") - 1).cast(dec) / 2)
        .cast(dec).as("n1"))
    val margY = cells.groupBy("y").agg(sum(col("nc")).as("ty"))
      .agg(sum(col("ty").cast(dec) * (col("ty") - 1).cast(dec) / 2)
        .cast(dec).as("n2"))
    val tot = cells.agg(sum(col("nc")).as("n"))
      .select(col("n"),
        (col("n").cast(dec) * (col("n") - 1).cast(dec) / 2)
          .cast(dec).as("n0"))
    pairs.crossJoin(broadcast(tot)).crossJoin(broadcast(margX))
      .crossJoin(broadcast(margY))
      .select(col("n").cast("long").as("n"),
        col("c").cast("double").as("c"),
        col("d").cast("double").as("d"),
        round((col("c") - col("d")).cast("double") /
          sqrt((col("n0") - col("n1")).cast("double") *
            (col("n0") - col("n2")).cast("double")), 6).as("tau"))
  }

  /** Spearman rank correlation with average-tie midranks (the
    * textbook definition; reference slot: the rank-statistics family
    * beside MADlib's Pearson `correlation` — PG exposes Pearson via
    * corr(), Spearman is the standard robust companion run on ranks).
    * ρ = Pearson over (midrank_x, midrank_y).
    *
    * Ranks come from [[Ranks.cumBelow]]'s distributed prefix sum over
    * the DISTINCT-value relation (midrank = (2·below + cnt + 1)/2 —
    * exact half-integers), joined back by value; never a
    * single-partition window over the corpus (the q_ml_auc
    * discipline). The moment aggregate is one split-sum pass; the
    * final ρ is a pinned-order expression both engines evaluate on
    * identical sums. Returns (n, rho). */
  def spearman(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    // NOT cached (r10, measured): caching the (x, y) pair here read
    // 3.6 -> 6.1 s — it defeats the per-marginal column pruning (each
    // marginal scans ONE pruned column today) and the rank joins
    // re-shuffle the pair relation regardless.
    val src = df.select(col(xCol).cast("double").as("x"),
      col(yCol).cast("double").as("y"))
    def midranks(c: String): DataFrame = {
      val per = src.groupBy(col(c).as("v")).agg(count(lit(1)).as("cnt"))
      Ranks.cumBelow(per, "v", "cnt")
        .select(col("v"),
          ((col("below") * 2 + col("cnt") + 1).cast("double") / 2.0)
            .as(s"r_$c"))
    }
    val ranked = src
      .join(midranks("x").withColumnRenamed("v", "xv"),
        col("x") === col("xv"))
      .join(midranks("y").withColumnRenamed("v", "yv"),
        col("y") === col("yv"))
    val m = ranked.agg(
      count(lit(1)).cast("double").as("n"),
      graft.queries.Q.dsum(col("r_x"), 6).as("sx"),
      graft.queries.Q.dsum(col("r_y"), 6).as("sy"),
      graft.queries.Q.dsum(col("r_x") * col("r_x"), 6).as("sxx"),
      graft.queries.Q.dsum(col("r_y") * col("r_y"), 6).as("syy"),
      graft.queries.Q.dsum(col("r_x") * col("r_y"), 6).as("sxy"))
    m.select(col("n").cast("long").as("n"),
      round((col("n") * col("sxy") - col("sx") * col("sy")) /
        (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
          sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 6)
        .as("rho"))
  }
}
