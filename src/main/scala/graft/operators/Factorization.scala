package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.queries.Q

/** Low-rank matrix factorization — the MADlib `lmf` module (Hellerstein
  * et al. 2012 ships `lmf_igd_run` for collaborative-filtering
  * factorization; reference bundles MADlib). MADlib's incremental
  * gradient descent is row-ORDER-dependent (non-reproducible across
  * segment counts); this restates the same objective
  * min Σ (r_ui − u·v)² + λ(‖u‖² + ‖v‖²) as deterministic batch ALS
  * (Koren, Bell & Volinsky 2009, "Matrix Factorization Techniques for
  * Recommender Systems") — alternating ridge solves with closed-form
  * 2×2 updates, the same determinism upgrade the SVM/logreg kernels
  * make over MADlib IGD.
  *
  * One ALS half-round = ONE equi-join (ratings ⨝ other-side factors on
  * the other-side id) + ONE keyed aggregate of 5 moment sums + a
  * map-only closed-form solve; the factor relations are entity-scale
  * (users / items), never driver state. λ > 0 makes every normal
  * matrix positive definite (det ≥ λ(s11+s22+λ) by Cauchy–Schwarz), so
  * no singular guard is needed.
  *
  * Cross-engine determinism: moment sums use the [[Q.dsum]] split-sum
  * discipline; factors QUANTIZE to micros after every solve
  * (floor(x·1e6+0.5)/1e6 — two correctly-rounded IEEE ops), so both
  * engines carry bit-identical factor state into the next round and
  * the output needs only presentation rounding.
  */
object Factorization {

  /** Micros quantizer — identical in Spark and DuckDB. */
  def q6(c: Column): Column = floor(c * lit(1000000d) + lit(0.5)) / lit(1000000d)

  /** Deterministic symmetry-breaking init for item factors:
    * v1 = 1, v2 = (i mod 97)/97 − 0.5 — exact int arithmetic then two
    * correctly-rounded fp ops. */
  def initItems(ratings: DataFrame, iCol: String): DataFrame =
    ratings.select(col(iCol).as("i")).distinct()
      .select(col("i"), lit(1.0).as("v1"),
        (col("i") % 97).cast("double") / lit(97.0) - lit(0.5) as "v2")

  /** Ridge-solve one side given the other: for each `keyCol` entity,
    * A = Σ v vᵀ + λI, b = Σ r·v, factor = A⁻¹b in closed 2×2 form.
    * `other` must expose (joinCol, f1, f2). */
  private def solveSide(ratings: DataFrame, keyCol: String,
      joinCol: String, rCol: String, other: DataFrame,
      f1: String, f2: String, lambda: Double): DataFrame = {
    val j = ratings.join(other, joinCol)
    val agg = j.groupBy(col(keyCol)).agg(
      Q.dsum(col(f1) * col(f1), 6).as("s11"),
      Q.dsum(col(f1) * col(f2), 6).as("s12"),
      Q.dsum(col(f2) * col(f2), 6).as("s22"),
      Q.dsum(col(rCol) * col(f1), 6).as("b1"),
      Q.dsum(col(rCol) * col(f2), 6).as("b2"))
    val (s11, s12, s22) = (col("s11") + lit(lambda), col("s12"),
      col("s22") + lit(lambda))
    val det = s11 * s22 - col("s12") * col("s12")
    agg.select(col(keyCol),
      q6((col("b1") * s22 - col("b2") * s12) / det).as("f1"),
      q6((col("b2") * s11 - col("b1") * s12) / det).as("f2"))
  }

  /** `iterations` full ALS rounds (users given items, then items given
    * users) at rank 2. `ratings` must have columns (u, i, r). Returns
    * (userFactors(u, u1, u2), itemFactors(i, v1, v2)), quantized. */
  def als2(ratings: DataFrame, lambda: Double, iterations: Int)
      : (DataFrame, DataFrame) = {
    val rs = ratings.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    KernelCaches.register(rs)
    var items = initItems(rs, "i")
    var users: DataFrame = null
    for (_ <- 0 until iterations) {
      users = solveSide(rs, "u", "i", "r",
        items.select(col("i"), col("v1"), col("v2")), "v1", "v2", lambda)
        .select(col("u"), col("f1").as("u1"), col("f2").as("u2"))
        .localCheckpoint(true)
      items = solveSide(rs, "i", "u", "r",
        users.select(col("u"), col("u1"), col("u2")), "u1", "u2", lambda)
        .select(col("i"), col("f1").as("v1"), col("f2").as("v2"))
        .localCheckpoint(true)
    }
    (users, items)
  }

  /** Per-user squared reconstruction error against the final factors —
    * one join + one [[Q.dsum]] aggregate. */
  def sseByUser(ratings: DataFrame, users: DataFrame, items: DataFrame)
      : DataFrame = {
    val res = col("r") - (col("u1") * col("v1") + col("u2") * col("v2"))
    ratings.join(users, "u").join(items, "i")
      .groupBy(col("u"))
      .agg(count(lit(1)).as("n_i"), Q.dsum(res * res, 6).as("sse"))
  }
}
