package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
