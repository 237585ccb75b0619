package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Decision-tree split search — the inner step of MADlib's
  * `tree_train` (CART, Breiman et al. 1984), which GP ships for
  * in-database classification. One stump = the root split; deeper
  * trees iterate this kernel per node on the filtered partition.
  *
  * Dataflow (the histogram method every distributed tree learner uses —
  * one pass builds per-(feature, bin, class) counts, candidate splits
  * are scored from the tiny histogram, never from row data):
  *   1. ONE aggregate over (dim, bucket, label) — the only corpus-scale
  *      shuffle, map-side combinable, output ≤ dims·bins·classes rows.
  *   2. Candidate thresholds join against the histogram (bucket ≤ i),
  *      left-side class counts aggregate per (dim, threshold).
  *   3. Weighted Gini from EXACT integer counts: with A = Σc nl_c²,
  *      B = Σc n_c·nl_c, S2 = Σc n_c², the right-side square sum is
  *      S2 − 2B + A (so classes absent on the left need no dense grid),
  *      and score = (nl − A/nl + nr − (S2−2B+A)/nr) / n. Square sums
  *      accumulate in DECIMAL(38) — n² passes 2^63 at full scale.
  *   4. argmin over (score, dim, threshold) — deterministic tie-break.
  *
  * Class totals are catalog-scale (k rows) and intentionally hit the
  * driver; everything corpus-scale stays distributed.
  */
object Trees {

  /** Best single split of `vecCol` (float array, `dim` wide) against
    * `labelCol`, over the fixed `thresholds` grid. Returns one row:
    * (dim, thr, n_left, n_right, score) — score = weighted Gini. */
  def decisionStump(
      emb: DataFrame, vecCol: String, labelCol: String,
      dim: Int, thresholds: Seq[Double]): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val x = emb.select(col(labelCol).cast("long").as("label"),
      posexplode(col(vecCol)).as(Seq("d", "xf")))
      .select($"label", $"d", $"xf".cast("double").as("x"))
    // bucket = #thresholds strictly below x → left(t_i) ⟺ bucket ≤ i
    val bucket = thresholds.map(t => when($"x" > t, 1).otherwise(0))
      .reduce(_ + _)
    val hist = x.select($"label", $"d", bucket.as("b"))
      .groupBy("d", "b", "label").agg(count(lit(1)).as("cnt"))
    // catalog-scale class totals (k rows) → literals
    val totals = emb.groupBy(col(labelCol).cast("long").as("label"))
      .agg(count(lit(1)).as("n_c")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = totals.values.sum
    val s2 = totals.values.map(c => BigDecimal(c) * BigDecimal(c)).sum
    val ncExpr = totals.foldLeft(lit(0L)) { case (e, (l, c)) =>
      when($"label" === l, c).otherwise(e)
    }
    val thr = thresholds.zipWithIndex
      .map { case (t, i) => (i, t) }.toDF("i", "thr")
    val perLabel = hist.join(broadcast(thr), $"b" <= $"i")
      .groupBy("d", "i", "thr", "label").agg(sum($"cnt").as("nl_c"))
      .withColumn("n_c", ncExpr)
    val dec = DecimalType(38, 0)
    val scored = perLabel.groupBy("d", "i", "thr")
      .agg(sum($"nl_c").as("nl"),
        sum(($"nl_c" * $"nl_c").cast(dec)).as("a"),
        sum(($"n_c" * $"nl_c").cast(dec)).as("bb"))
      .withColumn("nr", lit(n) - $"nl")
      .filter($"nl" > 0 && $"nr" > 0)
      .withColumn("sr2",
        (lit(s2).cast(dec) - lit(2) * $"bb" + $"a").cast("double"))
      .withColumn("score",
        (($"nl".cast("double") - $"a".cast("double") / $"nl".cast("double"))
          + ($"nr".cast("double") - $"sr2" / $"nr".cast("double")))
          / lit(n.toDouble))
    scored.orderBy($"score", $"d", $"i").limit(1)
      .select($"d".cast("int").as("dim"), $"thr",
        $"nl".cast("long").as("n_left"), $"nr".cast("long").as("n_right"),
        $"score")
  }
}
