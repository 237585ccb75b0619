package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** In-database principal component analysis — the MADlib `pca_train` /
  * `pca_project` modules GP ships for dimensionality reduction
  * (reference exposes them as SQL UDFs over dense/sparse matrix types).
  *
  * Dataflow (the MADlib dense path, re-expressed for Spark):
  *   1. ONE distributed pass accumulates the Gram matrix XᵀX, the
  *      column-sum vector, and the row count — `treeAggregate` with
  *      d·(d+1)/2 + d + 1 doubles of state per partition (d = embedding
  *      dim; 64 → ~2 KB), combined in O(log partitions) rounds. No row
  *      data ever reaches the driver.
  *   2. The d×d covariance eigendecomposes ON THE DRIVER via cyclic
  *      Jacobi — catalog-scale work (d ≤ a few hundred for embedding
  *      workloads; MADlib draws the same line, running its eigen step
  *      on the master for the dense case).
  *   3. Projection onto the top-k components is map-only: one native
  *      [[graft.expressions.DotFExpr]] kernel per component against a
  *      LITERAL loading vector (the [[Similarity.randomProjection]]
  *      shape) — whole-stage codegen, zero shuffle, pipelines with the
  *      scan at 100 TB.
  */
object Pca {

  /** (n, colSums[d], upper-triangular gram[d*(d+1)/2]) in one pass. */
  def gramStats(emb: DataFrame, vecCol: String, dim: Int)
      : (Long, Array[Double], Array[Double]) = {
    val tri = dim * (dim + 1) / 2
    val zero = (0L, new Array[Double](dim), new Array[Double](tri))
    val rows = emb.select(col(vecCol)).rdd
    val (n, s, g) = rows.treeAggregate(zero)(
      seqOp = { case ((n0, s0, g0), row) =>
        val v = row.getSeq[Float](0)
        var i = 0
        var t = 0
        while (i < dim) {
          val xi = v(i).toDouble
          s0(i) += xi
          var j = i
          while (j < dim) { g0(t) += xi * v(j).toDouble; j += 1; t += 1 }
          i += 1
        }
        (n0 + 1L, s0, g0)
      },
      combOp = { case ((n1, s1, g1), (n2, s2, g2)) =>
        var i = 0
        while (i < dim) { s1(i) += s2(i); i += 1 }
        var t = 0
        while (t < tri) { g1(t) += g2(t); t += 1 }
        (n1 + n2, s1, g1)
      })
    (n, s, g)
  }

  /** Sample covariance matrix from [[gramStats]] output. */
  def covariance(n: Long, s: Array[Double], g: Array[Double],
      dim: Int): Array[Array[Double]] = {
    val c = Array.ofDim[Double](dim, dim)
    var t = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val cov = (g(t) - s(i) * s(j) / n) / (n - 1)
        c(i)(j) = cov; c(j)(i) = cov
        t += 1; j += 1
      }
      i += 1
    }
    c
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix (Golub &
    * Van Loan §8.5). Returns (eigenvalues desc, row-major eigenvectors
    * aligned to them). Deterministic: fixed sweep order, fixed sweep
    * count with an off-diagonal convergence exit. */
  def jacobiEigen(m: Array[Array[Double]], sweeps: Int = 32)
      : (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < sweeps && off > 1e-14) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          off += 2 * a(p)(q) * a(p)(q)
          if (math.abs(a(p)(q)) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2 * a(p)(q))
            val t = math.signum(theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1)) match {
                case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1))
                case x => x
              }
            val c = 1 / math.sqrt(t * t + 1)
            val sn = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - sn * akq
              a(k)(q) = sn * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - sn * aqk
              a(q)(k) = sn * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - sn * vkq
              v(k)(q) = sn * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    (order.map(i => a(i)(i)).toArray,
      order.map(i => (0 until d).map(k => v(k)(i)).toArray).toArray)
  }

  /** Top-k principal components of the `vecCol` embeddings: returns
    * (eigenvalues desc, loadings) — loadings(c) is the unit loading
    * vector of component c. */
  def pcaTop(emb: DataFrame, vecCol: String, dim: Int, k: Int)
      : (Array[Double], Array[Array[Double]]) = {
    val (n, s, g) = gramStats(emb, vecCol, dim)
    require(n > 1, s"pcaTop: need at least 2 rows, got $n")
    val (vals, vecs) = jacobiEigen(covariance(n, s, g, dim))
    (vals.take(k), vecs.take(k))
  }

  /** Top singular pair of the raw (uncentered) embedding matrix by
    * POWER ITERATION on AᵀA — the MADlib `svd` module's dense
    * workload, restated so the whole computation is an oracle-able
    * dataflow (unlike [[jacobiEigen]], which runs on the driver and is
    * spec-gated): v ← AᵀAv / ‖AᵀAv‖ for a FIXED round count, v held as
    * a 64-row (dim, value) relation.
    *
    * Each round is two corpus passes over the exploded (id, d, x)
    * relation (cached once): Av = per-id micros-sum against the
    * broadcast v relation; Aᵀu = per-dim micros-sum against the
    * row-scale u relation (equi-join on id). All mass moves as exact
    * integer micros — per-term products quantize to longs before
    * summing, the norm squares likewise — so v and σ are bit-identical
    * across engines with no rounding. σ² ≈ ‖AᵀAv‖ at ‖v‖ = 1, so the
    * returned sigma = sqrt(‖w‖) is the dominant singular value
    * estimate.
    *
    * Returns 64 rows: (d, val, sigma) — sigma constant across rows. */
  def powerSvd(emb: DataFrame, idCol: String, vecCol: String,
      dim: Int, iterations: Int): DataFrame = {
    require(dim == 64 || math.sqrt(dim) == math.floor(math.sqrt(dim)),
      "init assumes dim is a perfect square so 1/sqrt(dim) is exact")
    val x = emb.select(col(idCol).as("id"),
      posexplode(col(vecCol)).as(Seq("d", "xf")))
      .select(col("id"), col("d"), col("xf").cast("double").as("x"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    KernelCaches.register(x)
    val spark = emb.sparkSession
    import spark.implicits._
    val v0 = 1.0 / math.sqrt(dim.toDouble) // exact for power-of-4 dims
    var v = (0 until dim).map(d => (d, v0, 0.0)).toDF("d", "val", "nrm")
    def mic(c: Column) =
      floor(c * lit(1000000d) + lit(0.5)).cast("long")
    for (_ <- 0 until iterations) {
      val u = x.join(broadcast(v.select(col("d"), col("val"))), "d")
        .groupBy("id").agg(sum(mic(col("x") * col("val"))).as("um"))
        .select(col("id"), (col("um").cast("double") / lit(1000000d))
          .as("u"))
      val w = x.join(u, "id")
        .groupBy("d").agg(sum(mic(col("x") * col("u"))).as("wm"))
        .select(col("d"),
          (col("wm").cast("double") / lit(1000000d)).as("wq"))
      val nrmDf = w.agg(sqrt(sum(mic(col("wq") * col("wq")))
        .cast("double") / lit(1000000d)).as("nrm"))
      v = w.crossJoin(nrmDf)
        .select(col("d"),
          (floor(col("wq") / col("nrm") * lit(1000000d) + lit(0.5))
            / lit(1000000d)).as("val"), col("nrm"))
        .localCheckpoint(true)
    }
    v.select(col("d"), col("val"), sqrt(col("nrm")).as("sigma"))
  }

  /** Project embeddings onto literal loading vectors: flattened
    * (idCol, c, score) rows — map-only, one native dot kernel per
    * component (the [[Similarity.randomProjection]] contract). Scores
    * are CENTERED (x − mean)ᵀ·w, the pca_project convention, folded as
    * xᵀ·w − mᵀ·w so the plan stays a literal dot plus one subtract. */
  def pcaProject(emb: DataFrame, idCol: String, vecCol: String,
      loadings: Array[Array[Double]], means: Array[Double]): DataFrame = {
    import graft.expressions.DotFExpr.dotf
    val scores = loadings.toIndexedSeq.map { w =>
      val mw = means.indices.map(i => means(i) * w(i)).sum
      dotf(col(vecCol), typedLit(w.toSeq)) - lit(mw)
    }
    emb.select(col(idCol),
      posexplode(array(scores: _*)).as(Seq("c", "score")))
  }
}
