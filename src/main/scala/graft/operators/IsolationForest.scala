package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Isolation forest anomaly scoring (Liu, Ting & Zhou 2008,
  * "Isolation Forest" — the unsupervised outlier detector every data
  * curation pipeline wants next to the median/MAD rule). The original
  * algorithm is already subsample-based BY DESIGN: each tree trains on
  * ψ ≈ 256 rows, so model fitting is O(1) in corpus size — here the ψ
  * rows come from a deterministic md5-ranked draw (TakeOrdered, never
  * a full sort), the tree builds in Scala over the collected sample
  * (catalog-scale by the paper's own contract), and only SCORING
  * touches the corpus: one map-only literal-CASE walk per tree.
  *
  * Determinism (both engines replay the identical model):
  *  - per-node split dimension and split fraction u come from md5 of
  *    (tree, node) — pure literals, no RNG state;
  *  - thresholds quantize to micros: thr = q6(min + u·(max−min)) over
  *    the node's sample min/max (exact float casts);
  *  - nodes with no sample rows keep (min = max = 0 → thr 0), so every
  *    walk is total;
  *  - path lengths h = depth + c(n_leaf) with the paper's harmonic
  *    correction c(n) = 2(ln(n−1)+γ) − 2(n−1)/n, micros-quantized (ln
  *    last-ulp discipline), n_leaf from the sample leaf counts;
  *  - anomaly score s = 2^(−h̄/c(ψ)), presented rounded.
  */
object IsolationForest {

  private def q6(x: Double) = math.floor(x * 1000000d + 0.5) / 1000000d

  /** Split dimension for (tree, node) — md5-derived literal. */
  def dimSel(t: Int, node: Int, dim: Int): Int =
    Trees.md5Byte(s"d:$t:$node") % dim

  /** Split fraction u ∈ [0, 1] for (tree, node) — md5-derived,
    * micros-quantized. */
  def uVal(t: Int, node: Int): Double =
    q6(Trees.md5Byte(s"u:$t:$node") / 255.0)

  /** Harmonic path-length correction c(n), micros-quantized. */
  def cFactor(n: Long): Double =
    if (n <= 1) 0.0
    else if (n == 2) 1.0
    else q6(2.0 * (math.log((n - 1).toDouble) + 0.5772156649015329) -
      2.0 * ((n - 1).toDouble / n.toDouble))

  /** One tree's model: thresholds for internal nodes 1..2^depth−1 and
    * the sample count per leaf node (2^depth..2^{depth+1}−1). */
  final case class Tree(thr: Array[Double], leafN: Map[Int, Long])

  /** Fit tree `t` on the deterministic ψ-row md5 sample. */
  def fitTree(emb: DataFrame, idCol: String, vecCol: String,
      dim: Int, psi: Int, depth: Int, t: Int): Tree = {
    val hk = conv(substring(md5(concat(lit(s"s$t:"),
      col(idCol).cast("string"))), 1, 8), 16, 10).cast("long")
    val sample = emb.select(col(vecCol), hk.as("hk"), col(idCol))
      .orderBy(col("hk"), col(idCol)).limit(psi)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).toArray)
    val nNodes = 1 << depth
    val thr = new Array[Double](nNodes) // index = node id, 1-based
    var assign = sample.map(_ => 1) // node of each sample row
    for (l <- 0 until depth) {
      for (node <- (1 << l) until (1 << (l + 1))) {
        val d = dimSel(t, node, dim)
        val xs = sample.indices.filter(assign(_) == node)
          .map(i => sample(i)(d).toDouble)
        val (mn, mx) =
          if (xs.isEmpty) (0.0, 0.0) else (xs.min, xs.max)
        thr(node) = q6(mn + uVal(t, node) * (mx - mn))
      }
      assign = sample.indices.map { i =>
        val n = assign(i)
        n * 2 + (if (sample(i)(dimSel(t, n, dim)).toDouble > thr(n)) 1
        else 0)
      }.toArray
    }
    Tree(thr, assign.groupBy(identity)
      .map { case (leaf, rows) => leaf -> rows.length.toLong })
  }

  /** Anomaly scores for every row: (id, h_avg, score).
    *
    * The walk is STAGED: the 15 per-node comparisons first land in
    * their own projection as bit columns, then each level's node id is
    * a small CASE over the previous level's node ATTRIBUTE plus a bit
    * attribute. Inlining everything into one projection instead
    * (the first cut) duplicated the node expression into every CASE
    * arm — exponential expression growth, measured ~18 s of
    * planning+janino per run at ANY data size (the NOTES case-chain
    * wall). The staged form keeps every projection thin: Catalyst's
    * CollapseProject preserves the boundaries because each hoisted
    * expression is non-cheap and multiply referenced. */
  def scores(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
      psi: Int, depth: Int, trees: Int): DataFrame = {
    val models = (0 until trees).map(t =>
      fitTree(emb, idCol, vecCol, dim, psi, depth, t))
    var df = emb.select(col(idCol), col(vecCol))
    for (t <- 0 until trees) {
      val m = models(t)
      val bits = (1 until (1 << depth)).map { n =>
        when(element_at(col(vecCol), dimSel(t, n, dim) + 1)
          .cast("double") > m.thr(n), 1).otherwise(0).as(s"__b${t}_$n")
      }
      df = df.select(df.columns.map(col) ++ bits: _*)
      df = df.withColumn(s"__n$t", lit(2) + col(s"__b${t}_1"))
      for (l <- 1 until depth) {
        val stepped = ((1 << l) until (1 << (l + 1)))
          .foldLeft(lit(null).cast("int")) { (e, n) =>
            when(col(s"__n$t") === n, lit(n * 2) + col(s"__b${t}_$n"))
              .otherwise(e)
          }
        df = df.withColumn(s"__n$t", stepped)
      }
      val leaves = (1 << depth) until (1 << (depth + 1))
      val h = leaves.foldLeft(lit(null).cast("double")) { (e, leaf) =>
        when(col(s"__n$t") === leaf,
          lit(depth.toDouble + cFactor(m.leafN.getOrElse(leaf, 0L))))
          .otherwise(e)
      }
      df = df.withColumn(s"__h$t", h)
    }
    val hAvg = (0 until trees).map(t => col(s"__h$t"))
      .reduce(_ + _) / lit(trees.toDouble)
    val cpsi = cFactor(psi.toLong)
    df.select(col(idCol), hAvg.as("h_avg"))
      .select(col(idCol), col("h_avg"),
        pow(lit(2.0), lit(0.0) - col("h_avg") / lit(cpsi)).as("score"))
  }
}
