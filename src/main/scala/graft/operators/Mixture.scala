package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus mixture resampling — the training-mix op: given
  * target OUTPUT fractions per class (language, source, domain...),
  * downsample each class so the result hits the target mixture at the
  * maximal feasible size.
  *
  * T = min over classes of n_s / w_s  (the binding class caps the total)
  * r_s = min(1, T·w_s / n_s)          (per-class acceptance rate)
  * keep row ⇔ hash(key) mod 1e6 < round(r_s·1e6)
  *
  * Scale shape: the only driver-side data is one count per class
  * (catalog-scale); the keep-decision is a map-only hash filter pushed
  * at the scan — no shuffle, no sort, and the SAME in/out decision on
  * any engine, cluster size, or partitioning (TABLESAMPLE's RNG is
  * none of those). Composes with incremental ingest: a document's fate
  * never changes as the corpus grows, only the thresholds recomputed
  * per release do.
  *
  * Reference frame: gp_sampling / TABLESAMPLE (gram.y
  * tablesample_clause) give per-table rates; the mixture solve is the
  * piece a data pipeline adds on top.
  */
object Mixture {

  /** Keep-threshold (hash permille-of-million) per class for the
    * maximal output matching `weights`. Exposed for tests/oracles. */
  def thresholds(
      df: DataFrame, classCol: Column,
      weights: Map[String, Double]): Map[String, Long] = {
    val counts = df.groupBy(classCol.as("__c")).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val t = weights.collect {
      case (c, w) if counts.getOrElse(c, 0L) > 0 => counts(c).toDouble / w
    }.min
    weights.collect { case (c, w) if counts.getOrElse(c, 0L) > 0 =>
      val rate = math.min(1.0, t * w / counts(c).toDouble)
      c -> math.floor(rate * 1000000d + 0.5).toLong
    }
  }

  /** Temperature-scaled mixture weights — the multilingual-LM sampling
    * rule (e.g. Conneau & Lample 2019, XLM, public method): class
    * probability ∝ n_s^alpha, so alpha=1 keeps natural proportions,
    * alpha→0 flattens toward uniform (upweighting low-resource
    * classes), alpha between damps the head. Returns normalized weights
    * to feed [[resample]]; the only data movement is the same
    * catalog-scale count per class. pow/normalize run in driver doubles
    * with a fixed fold order (sorted class names) so the derived
    * thresholds are engine-reproducible. */
  def temperatureWeights(
      df: DataFrame, classCol: Column, alpha: Double): Map[String, Double] = {
    val counts = df.groupBy(classCol.as("__c")).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val pows = counts.toSeq.sortBy(_._1)
      .map { case (c, n) => c -> math.pow(n.toDouble, alpha) }
    val z = pows.foldLeft(0.0)(_ + _._2)
    pows.map { case (c, p) => c -> p / z }.toMap
  }

  /** Filter `df` down to the target mixture. `keyCol` must be a stable
    * unique id (the hash input). Classes absent from `weights` drop. */
  def resample(
      df: DataFrame, classCol: Column, keyCol: Column,
      weights: Map[String, Double]): DataFrame = {
    val thr = thresholds(df, classCol, weights)
    val thrCol = thr.foldLeft(lit(null).cast("long")) {
      case (acc, (c, t)) => when(classCol === c, lit(t)).otherwise(acc)
    }
    val bucket =
      conv(substring(md5(keyCol.cast("string")), 1, 8), 16, 10)
        .cast("long") % 1000000L
    df.filter(bucket < thrCol) // null threshold (unlisted class) drops
  }
}
