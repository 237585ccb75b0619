package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus assembly for training-data pipelines (extension alongside
  * [[Mixture]]): deterministic split assignment and global example
  * shuffling — the bookkeeping steps between a cleaned corpus and a
  * training run. Both are engine-portable by construction (md5 over the
  * id, not a private hash), so a downstream consumer can re-derive the
  * same assignment without rerunning the pipeline.
  */
object Corpus {

  /** 0..99 bucket of an id under a seed — md5 is identical everywhere
    * (same routine backs [[Mixture]] keeps and the TABLESAMPLE hash). */
  private def bucket(idCol: String, seed: String) =
    conv(substring(md5(concat(lit(seed + ":"),
      col(idCol).cast("string"))), 1, 8), 16, 10).cast("long") % 100

  /** Deterministic train/val/test assignment: the id's seeded md5
    * bucket lands in cumulative percent ranges. Map-only — no shuffle,
    * no state; membership is a pure function of (seed, id), so any
    * later job (or another engine) recomputes the same split. `splits`
    * are (name, percent) in range order and must sum to 100. */
  def splitAssign(
      df: DataFrame, idCol: String, seed: String,
      splits: Seq[(String, Int)],
      splitCol: String = "split"): DataFrame = {
    require(splits.map(_._2).sum == 100,
      s"split percents must sum to 100: $splits")
    val b = bucket(idCol, seed)
    val cum = splits.scanLeft(0)(_ + _._2).tail
    val expr = splits.zip(cum).init.foldLeft(when(lit(false), lit(""))) {
      case (acc, ((name, _), hi)) => acc.when(b < hi, name)
    }.otherwise(splits.last._1)
    df.withColumn(splitCol, expr)
  }

  /** Deterministic global shuffle: order by the seeded md5 of the id
    * (id itself breaks ties) and assign 0-based positions. Uses the
    * distributed two-pass id assignment ([[SequenceOps.assignIds]]:
    * range-partition + per-partition offsets) — NO single-partition
    * window, so the sort parallelizes like any range sort. Re-running
    * with the same seed reproduces the exact training order; changing
    * the seed is a fresh epoch permutation. */
  def shuffle(
      df: DataFrame, idCol: String, seed: String,
      posCol: String = "pos"): DataFrame = {
    val keyed = df.withColumn("__shuffle_key",
      md5(concat(lit(seed + ":"), col(idCol).cast("string"))))
    SequenceOps.assignIds(keyed, posCol, 0L,
      Seq(col("__shuffle_key"), col(idCol)))
      .drop("__shuffle_key")
  }

  /** Per-domain quota cap (RefinedWeb / Dolma-style curation: bound any
    * one host's share of the corpus): keep at most `cap` documents per
    * `keyCol`, chosen by the deterministic priority `(id·2654435761)
    * mod 1000003` (Knuth's multiplicative hash — plain integer
    * arithmetic, so any engine recomputes the identical keep set; id
    * breaks the rare priority tie). Both operands are reduced mod
    * 1000003 BEFORE the multiply — (a·b) mod m ≡ ((a mod m)·(b mod m))
    * mod m — so the product stays < 2^40 and the formula never
    * overflows int64, no matter how large ids grow at 100 TB (a raw
    * id·2654435761 wraps negative past id ≈ 3.5e9, and engines that
    * check overflow, e.g. DuckDB, would error instead).
    *
    * Scale: rank-within-group with a LIMIT-like bound is exactly what
    * Spark's WindowGroupLimit rewrite exists for — each map partition
    * keeps only its local top-`cap` per key BEFORE the shuffle, so a
    * hot domain with 10M pages moves ≤ cap·partitions rows, not 10M.
    * Plan-gated in PlanSpec. */
  def domainCap(
      df: DataFrame, keyCol: String, idCol: String, cap: Int): DataFrame = {
    val pr = ((col(idCol) % lit(1000003L)) * lit(2654435761L % 1000003L)) %
      lit(1000003L)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(pr.asc, col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap)
      .drop("__rn")
  }

  /** Weighted sample without replacement, k rows — Efraimidis &
    * Spirakis 2006 (A-ES, public method): each row draws a
    * deterministic uniform u from md5(id) and takes key u^(1/weight);
    * the global top-k keys ARE a weighted sample. The standard way to
    * oversample high-quality / long documents reproducibly: the
    * "random" draw is a hash, so the selection is identical across
    * engines, cluster sizes, and reruns, and composes with incremental
    * ingest.
    *
    * Scale: key is map-only; top-k is TakeOrderedAndProject (per-
    * partition heaps, no global sort). The ranked key is ROUNDED
    * (10 dp, id tiebreak) so pow()'s last-ulp engine differences cannot
    * reorder the cut. Returns (rk, id row..., skey). */
  def weightedSample(
      df: DataFrame, idCol: String, weightCol: String, k: Int): DataFrame = {
    val u = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)
    val skey = round(pow(u, lit(1.0) / col(weightCol).cast("double")), 10)
    // top-k via orderBy+limit → TakeOrderedAndProject (per-partition
    // heaps); the rank window then runs over k rows only, never the
    // corpus — a corpus-wide unpartitioned window would serialize
    val top = df.withColumn("skey", skey)
      .orderBy(col("skey").desc, col(idCol).asc).limit(k)
    top.withColumn("rk",
      row_number().over(Window.orderBy(col("skey").desc, col(idCol).asc)))
  }

  import org.apache.spark.sql.Column

  /** URL canonicalization (C4 / RefinedWeb curation: URL-level dedup
    * runs BEFORE any content pass — two crawls of one page must agree
    * on a key). Normalization, each step a deterministic string op so
    * any engine recomputes the identical key:
    *   1. scheme and host lowercase (RFC 3986 §6.2.2.1 — path stays
    *      case-sensitive);
    *   2. default ports drop (:80 http, :443 https — §6.2.3);
    *   3. the fragment drops (never sent to the server);
    *   4. utm_* tracking params drop; surviving params SORT (one page,
    *      any param order);
    *   5. trailing path slashes drop.
    * Map-only codegen: regexp splits + array filter/sort + concat —
    * no UDF, no shuffle. At 100 TB this runs inside the scan stage and
    * the dedup that follows shuffles canonical keys, not raw text. */
  def canonicalUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, UrlSchemeRe, 1))
    val host0 = lower(regexp_extract(url, UrlHostRe, 1))
    val host = when(scheme === "http",
        regexp_replace(host0, ":80$", ""))
      .when(scheme === "https", regexp_replace(host0, ":443$", ""))
      .otherwise(host0)
    val path = regexp_replace(
      regexp_extract(url, UrlPathRe, 1), "/+$", "")
    val query = regexp_extract(url, UrlQueryRe, 1)
    val params = array_sort(filter(split(query, "&"),
      p => !p.startsWith("utm_") && p =!= ""))
    val q = array_join(params, "&")
    concat(scheme, lit("://"), host, path,
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }

  // shared with the oracle SQL so both engines run the SAME patterns
  val UrlSchemeRe = "^([a-zA-Z]+)://"
  val UrlHostRe = "^[a-zA-Z]+://([^/?#]*)"
  val UrlPathRe = "^[a-zA-Z]+://[^/?#]*([^?#]*)"
  val UrlQueryRe = "\\?([^#]*)"

  /** URL-level exact dedup: group on the canonical key, keep the
    * smallest id as the representative. One hash shuffle on the
    * canonical key — the C4 first-pass shape. */
  def urlDedup(df: DataFrame, urlCol: String, idCol: String): DataFrame =
    df.withColumn("canon_url", canonicalUrl(col(urlCol)))
      .groupBy("canon_url")
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("n_dupes"))
}
