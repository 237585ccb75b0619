package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Packed tile row for [[Similarity.nearDupPairsBlocked]]. */
final case class TileVec(id: Long, v: Array[Float])

/** One tile pair of the blocked all-pairs join. */
final case class TilePair(
    bid_a: Int, rows_a: Array[TileVec],
    bid_b: Int, rows_b: Array[TileVec])

/** Embedding similarity search (extension beyond the reference; the
  * reference's sparse-vector contrib gpcontrib/gp_sparse_vector/
  * sparse_vector.h:125-146 declares svec_dot/svec_l2norm — same algebra,
  * re-expressed as codegen'd array expressions over ArrayType(FloatType)).
  *
  * Scale design: brute-force top-k is one broadcast of the (small) query
  * set against a full corpus scan — linear, no shuffle of the corpus.
  * The LSH variant buckets by random-hyperplane signs so candidate
  * generation is an equi-join on bucket id; recall is traded via the
  * number of planes/tables.
  */
object Similarity {

  /** Element sum a·b in double (index order, deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Known-dimension dot product as a left-deep Add chain — identical
    * value to [[dot]] (same fold order). Superseded in the hot paths by
    * the native [[graft.expressions.DotFExpr]]: the unrolled chain is
    * numerically exact but costs hundreds of Catalyst nodes per call
    * site, and with several dots per operator the per-invocation
    * analysis/optimization/codegen time dwarfed the actual work. Kept
    * as the cross-checked reference spelling (ExpressionSpec asserts
    * bit-equality against dotf). */
  def dotFixed(a: Column, b: Column, dim: Int): Column =
    (1 to dim).map { i =>
      element_at(a, i).cast("double") * element_at(b, i).cast("double")
    }.reduce((x, y) => x + y)

  /** Native one-node dot product (bit-equal to [[dotFixed]]). */
  private def dotf(a: Column, b: Column): Column =
    graft.expressions.DotFExpr.dotf(a, b)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Cosine with pre-computed norms (value-identical to [[cosine]]). */
  def cosineWithNorms(dotAb: Column, normA: Column, normB: Column): Column =
    dotAb / (normA * normB)

  /** Exact top-k by cosine for each query vector: broadcast queries,
    * scan corpus once, per-query window top-k (TakeOrdered per key). */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      qId: String = "q_id", qVec: String = "q_vec",
      cId: String = "c_id", cVec: String = "c_vec",
      dim: Int = 64): DataFrame = {
    val qn = queries.withColumn("qnrm", sqrt(dotf(col(qVec), col(qVec))))
    val cn = corpus.withColumn("cnrm", sqrt(dotf(col(cVec), col(cVec))))
    val scored = cn.crossJoin(broadcast(qn))
      .filter(col(qId) =!= col(cId))
      .select(col(qId), col(cId),
        cosineWithNorms(dotf(col(qVec), col(cVec)),
          col("qnrm"), col("cnrm")).as("cos"))
    val w = Window.partitionBy(qId).orderBy(col("cos").desc, col(cId))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Hard-negative mining for contrastive training (the standard
    * in-batch-negatives upgrade — e.g. Robinson et al. 2021,
    * "Contrastive Learning with Hard Negative Samples", public method):
    * for each anchor, the k most-cosine-similar corpus vectors carrying
    * a DIFFERENT label — the near-misses that actually move a
    * contrastive loss, versus random negatives that are trivially far.
    * Returns (q_id, c_id, rk, cos).
    *
    * Scale: same broadcast-anchor dataflow as [[bruteForceTopK]], with
    * the label inequality fused BEFORE the per-anchor top-k window so
    * same-class rows never reach the rank heap; swap an LSH/IVF
    * candidate generator in for the 100 TB path — the mining filter and
    * rank stage are unchanged. */
  def hardNegatives(
      anchors: DataFrame, corpus: DataFrame, k: Int,
      qId: String = "q_id", qVec: String = "q_vec", qLabel: String = "q_label",
      cId: String = "c_id", cVec: String = "c_vec", cLabel: String = "c_label")
      : DataFrame = {
    val qn = anchors.withColumn("qnrm", sqrt(dotf(col(qVec), col(qVec))))
    val cn = corpus.withColumn("cnrm", sqrt(dotf(col(cVec), col(cVec))))
    val scored = cn.crossJoin(broadcast(qn))
      .filter(col(qLabel) =!= col(cLabel))
      .select(col(qId), col(cId),
        cosineWithNorms(dotf(col(qVec), col(cVec)),
          col("qnrm"), col("cnrm")).as("cos"))
    val w = Window.partitionBy(qId).orderBy(col("cos").desc, col(cId))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** kNN label classification over embeddings (Fix & Hodges 1951; the
    * standard majority-vote rule): each query takes the label held by
    * most of its k nearest labeled neighbors by cosine; ties break to
    * the smallest label so the prediction is deterministic. Composes
    * with any candidate generator — brute force here; swap in
    * [[lshTopK]]/[[ivfTopK]] for the 100 TB path, the vote stage is
    * unchanged.
    *
    * Scale: neighbor rows are |queries|·k (tiny next to the corpus);
    * the label attach is an equi-join on the corpus id, and the vote is
    * a map-side-combinable aggregate — `max(struct(votes, −label))`
    * picks the winner without a per-query window. */
  def knnClassify(
      queries: DataFrame, corpus: DataFrame, k: Int,
      labelCol: String = "label",
      qId: String = "q_id", qVec: String = "q_vec",
      cId: String = "c_id", cVec: String = "c_vec"): DataFrame = {
    val nb = bruteForceTopK(
      queries, corpus.select(col(cId), col(cVec)), k, qId, qVec, cId, cVec)
      .join(corpus.select(col(cId), col(labelCol)), Seq(cId))
    nb.groupBy(col(qId), col(labelCol))
      .agg(count(lit(1)).as("votes"))
      .groupBy(qId)
      .agg(max(struct(col("votes"), (-col(labelCol)).as("nl"),
        col(labelCol).as("l"))).as("w"))
      .select(col(qId), col("w.l").as("pred_label"),
        col("w.votes").as("votes"))
  }

  /** Deterministic pseudo-random hyperplanes: plane p, dim d weight from a
    * splitmix-style integer mix — reproducible in plain SQL, no RNG state. */
  def planeWeight(p: Int, d: Int): Double = {
    var z = (p.toLong * 1000003L + d.toLong) * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (z.toDouble / Long.MaxValue.toDouble) // in [-1, 1]
  }

  /** Sign-bucket id from `planes` random hyperplanes (native expression;
    * value-identical to the unrolled when-chain spelling). */
  def lshBucket(vec: Column, planes: Int, dim: Int): Column =
    graft.expressions.LshBucketExpr.lshBucket(vec, planes)

  /** ANN top-k: bucket corpus and queries by hyperplane signs, join on
    * bucket (the scale path — one shuffle on a small key), rank within
    * candidates. Exactness is traded for the bucket-join prune. */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame, k: Int, planes: Int, dim: Int,
      qId: String = "q_id", qVec: String = "q_vec",
      cId: String = "c_id", cVec: String = "c_vec"): DataFrame = {
    val qb = queries.withColumn("bucket", lshBucket(col(qVec), planes, dim))
    val cb = corpus.withColumn("bucket", lshBucket(col(cVec), planes, dim))
    val w = Window.partitionBy(qId).orderBy(col("cos").desc, col(cId))
    qb.join(cb, "bucket")
      .filter(col(qId) =!= col(cId))
      .select(col(qId), col(cId),
        cosineWithNorms(dotf(col(qVec), col(cVec)),
          sqrt(dotf(col(qVec), col(qVec))),
          sqrt(dotf(col(cVec), col(cVec)))).as("cos"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Multi-table LSH top-k — the recall repair for sign-LSH on weakly
    * correlated corpora: T independent hash tables lift recall from
    * p^planes to 1-(1-p^planes)^T. All T tables come from ONE native
    * bucket evaluation (`tables*planes` sign bits, sliced per table
    * with shifts), so the per-row cost is a single weight-matrix pass;
    * candidates are the union of per-table bucket joins, deduped by a
    * (q,c) group-by before ranking. Still sub-quadratic: T small-key
    * equi-joins, no all-pairs anywhere. */
  def lshTopKMulti(
      queries: DataFrame, corpus: DataFrame, k: Int, planes: Int,
      tables: Int, dim: Int,
      qId: String = "q_id", qVec: String = "q_vec",
      cId: String = "c_id", cVec: String = "c_vec"): DataFrame = {
    val bits = tables * planes
    require(bits <= 62, s"tables*planes = $bits exceeds a long's sign bits")
    def tableBuckets(vec: Column): Column = {
      val full = lshBucket(vec, bits, dim)
      array((0 until tables).map { t =>
        shiftrightunsigned(full, t * planes)
          .bitwiseAND(lit((1L << planes) - 1)) + lit(t.toLong << 32)
      }: _*)
    }
    val qb = queries.withColumn("bucket", explode(tableBuckets(col(qVec))))
    val cb = corpus.withColumn("bucket", explode(tableBuckets(col(cVec))))
    val scored = qb.join(cb, "bucket")
      .filter(col(qId) =!= col(cId))
      .select(col(qId), col(cId),
        cosineWithNorms(dotf(col(qVec), col(cVec)),
          sqrt(dotf(col(qVec), col(qVec))),
          sqrt(dotf(col(cVec), col(cVec)))).as("cos"))
      .groupBy(col(qId), col(cId)).agg(max(col("cos")).as("cos"))
    val w = Window.partitionBy(qId).orderBy(col("cos").desc, col(cId))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** kNN-graph construction: for EVERY corpus vector, its k approximate
    * nearest neighbors — the both-sides-large ANN self-join behind
    * SemDeDup-style semantic clustering. Unlike [[lshTopKMulti]] (small
    * broadcastable query set), here the query side IS the corpus, so the
    * design must survive both sides at 100 TB:
    *   - buckets AND the l2 norm are computed ONCE per row into a cached
    *     projection that both join sides read (norms are the expensive
    *     per-pair term in lshTopKMulti's spelling — precomputing them
    *     makes the per-candidate work a single native dot);
    *   - candidate generation is T bucket equi-joins (explode over table
    *     slices of one native sign-bit evaluation), a plain shuffle join
    *     when neither side broadcasts;
    *   - (src,dst) candidate dedup across tables is a partial-aggregated
    *     groupBy, then a per-src window top-k.
    * The caches are registered with [[graft.operators.KernelCaches]] and
    * released by the driver after the consuming action. */
  def knnGraph(
      emb: DataFrame, idCol: String, vecCol: String, k: Int,
      planes: Int, tables: Int, dim: Int): DataFrame = {
    val bits = tables * planes
    require(bits <= 62, s"tables*planes = $bits exceeds a long's sign bits")
    val full = lshBucket(col(vecCol), bits, dim)
    val tableBuckets = array((0 until tables).map { t =>
      shiftrightunsigned(full, t * planes)
        .bitwiseAND(lit((1L << planes) - 1)) + lit(t.toLong << 32)
    }: _*)
    // Persist BEFORE exploding the per-table buckets: the cache holds
    // exactly one copy of (vec, nrm, bucket-array) per corpus row; each
    // join side explodes its own read of the cached projection. A
    // post-explode persist would store every vector `tables`× — a 4×
    // cache at the 100 TB target for zero benefit.
    val indexed = emb.select(col(idCol).as("id"), col(vecCol).as("vec"),
      sqrt(graft.expressions.DotFExpr.dotf(col(vecCol), col(vecCol)))
        .as("nrm"),
      tableBuckets.as("buckets"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = indexed.select(explode(col("buckets")).as("bucket"),
      col("id").as("src"), col("vec").as("v_a"), col("nrm").as("n_a"))
    val b = indexed.select(explode(col("buckets")).as("bucket"),
      col("id").as("dst"), col("vec").as("v_b"), col("nrm").as("n_b"))
    val scored = a.join(b, Seq("bucket"))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"),
        (graft.expressions.DotFExpr.dotf(col("v_a"), col("v_b")) /
          (col("n_a") * col("n_b"))).as("cos"))
      .groupBy(col("src"), col("dst")).agg(max(col("cos")).as("cos"))
    val w = Window.partitionBy("src").orderBy(col("cos").desc, col("dst"))
    KernelCaches.register(indexed)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** IVF (inverted-file) ANN: partition the corpus into cells around
    * centroid vectors, search only the query's `nProbe` nearest cells.
    * Centroids are a FIXED-COUNT deterministic sample: the sampling
    * modulus grows with the corpus so ~`numCentroids` survive no matter
    * the corpus size — the broadcast centroid set stays bounded at 100 TB
    * (a corpus-proportional centroid count would grow the broadcast and
    * the assignment cross join without bound). A real deployment would
    * k-means the same fixed k; the index/probe dataflow (assign →
    * equi-join on cell → score) is identical and is the part that has to
    * scale. The corpus count is a catalog-scale driver scalar (one
    * aggregate job, no row data collected). Corpus vectors live in
    * exactly one cell, so probing never duplicates a candidate. */
  def ivfTopK(
      queries: DataFrame, corpus: DataFrame, k: Int, nProbe: Int, dim: Int,
      numCentroids: Int = 64,
      qId: String = "q_id", qVec: String = "q_vec",
      cId: String = "c_id", cVec: String = "c_vec"): DataFrame = {
    val modulus = math.max(1L, corpus.count() / numCentroids)
    val cents = corpus.filter(col(cId) % modulus === 0)
      .select(col(cId).as("cent_id"), col(cVec).as("cent_vec"))
    ivfTopKWith(queries, corpus, cents, k, nProbe, qId, qVec, cId, cVec)
  }

  /** Lloyd's k-means over the corpus, expressed as DataFrame ops — the
    * production way to train the IVF codebook at a fixed k. Each
    * iteration is (a) assign: broadcast the k centroids, nearest-by-
    * cosine per vector (one corpus scan, no shuffle of the corpus), and
    * (b) update: element-wise member mean via posexplode → groupBy
    * (cell, dim) — one shuffle whose key space is k·dim, independent of
    * corpus size. Init is the deterministic fixed-k sample, so runs are
    * reproducible. A cell that loses all members drops out (k shrinks) —
    * standard Lloyd's behavior. Returns (cent_id, cent_vec). */
  def kmeansCentroids(
      corpus: DataFrame, k: Int, iters: Int,
      cId: String = "c_id", cVec: String = "c_vec"): DataFrame = {
    val modulus = math.max(1L, corpus.count() / k)
    // orderBy before limit → TakeOrdered: the k seeds are the k smallest
    // ids in the modulus sample, identical across any input partitioning
    // (a bare limit after a filter picks whichever partitions answer
    // first, breaking the reproducible-runs contract).
    var cents = corpus.filter(col(cId) % modulus === 0)
      .orderBy(col(cId))
      .limit(k)
      .select(col(cId).as("cent_id"), col(cVec).as("cent_vec"))
    for (_ <- 0 until iters) {
      val w = Window.partitionBy(cId)
        .orderBy(col("cent_cos").desc, col("cent_id"))
      val assigned = corpus.crossJoin(broadcast(cents))
        .withColumn("cent_cos", cosineWithNorms(
          dotf(col(cVec), col("cent_vec")),
          sqrt(dotf(col(cVec), col(cVec))),
          sqrt(dotf(col("cent_vec"), col("cent_vec")))))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("cent_id").as("cell"), col(cVec).as("v"))
      cents = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cell", "pos")
        .agg(avg(col("x")).as("mx"))
        .groupBy("cell")
        .agg(transform(
          sort_array(collect_list(struct(col("pos"), col("mx")))),
          s => s.getField("mx").cast("float")).as("cent_vec"))
        .select(col("cell").as("cent_id"), col("cent_vec"))
    }
    cents
  }

  /** Product quantization (Jégou, Douze & Schmid 2011 — the FAISS
    * IndexPQ memory architecture): the d-dim space splits into m
    * subspaces; each subvector quantizes to the nearest of k
    * sub-centroids, so a stored vector is m byte-scale codes (4 B
    * here vs 256 B raw, vs 64 B for SQ8). Scoring is asymmetric
    * (ADC): full-precision query against the RECONSTRUCTED corpus
    * vector — by the PQ identity equal to summing per-subspace
    * query·centroid products.
    *
    * Codebook = the deterministic fixed-k modulus sample ([[ivfTopK]]
    * init; reproducible, catalog-scale collect) — a production run
    * trains per-subspace Lloyd rounds with [[kmeansCentroids]]'
    * dataflow, which changes no shape here. Encoding is MAP-ONLY: per
    * subspace an array_min over k (dist, cid) structs whose
    * squared-diff terms micros-quantize — exact fixed-point, so both
    * engines pick identical codes (the k-means argmin discipline). */
  def pqCodebook(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int): Seq[Seq[Double]] = {
    val modulus = math.max(1L, corpus.count() / k)
    corpus.filter(col(idCol) % modulus === 0).orderBy(col(idCol))
      .limit(k)
      .select(col(vecCol).cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toSeq).toSeq
  }

  /** PQ encode: (idCol, codes array&lt;int&gt;) — one map-only
    * projection, no shuffle. */
  def pqCodes(corpus: DataFrame, idCol: String, vecCol: String,
      cents: Seq[Seq[Double]], m: Int): DataFrame = {
    val subDim = cents.head.length / m
    val v = col(vecCol).cast("array<double>")
    val codes = array((0 until m).map { s =>
      val sub = slice(v, s * subDim + 1, subDim)
      val cands = array(cents.indices.map { c =>
        val cv = typedLit(cents(c).slice(s * subDim, (s + 1) * subDim))
        struct(
          aggregate(zip_with(sub, cv, (x, y) =>
            floor((x - y) * (x - y) * lit(1000000d) + lit(0.5))
              / lit(1000000d)),
            lit(0d), (acc, t) => acc + t).as("d"),
          lit(c).as("cid"))
      }: _*)
      array_min(cands).getField("cid")
    }: _*)
    corpus.select(col(idCol), codes.as("codes"))
  }

  /** Reconstructed vector x̂ from a codes column — map-only literal
    * lookup, concatenating the coded sub-centroids. */
  def pqReconstruct(codesCol: Column, cents: Seq[Seq[Double]],
      m: Int): Column = {
    val subDim = cents.head.length / m
    concat((0 until m).map { s =>
      val table = cents.map(_.slice(s * subDim, (s + 1) * subDim))
      element_at(typedLit(table), element_at(codesCol, s + 1) + 1)
    }: _*)
  }

  /** Element-wise mean embedding per group — chunk→document pooling,
    * per-class prototypes, cluster summaries. Same dimension-keyed
    * shuffle as [[kmeansCentroids]]'s update step: posexplode →
    * groupBy (group, dim) with map-side partial sums, so the shuffled
    * key space is groups·dim — independent of corpus size — and no
    * group's vectors ever gather on one node as whole arrays. Returns
    * (grp, centroid: array&lt;double&gt;). */
  def meanPool(
      emb: DataFrame, groupCol: String, vecCol: String): DataFrame =
    emb.select(col(groupCol).as("grp"),
        posexplode(col(vecCol)).as(Seq("dim", "x")))
      .groupBy("grp", "dim")
      .agg((sum(col("x")) / count(lit(1))).as("m"))
      .groupBy("grp")
      .agg(transform(
        sort_array(collect_list(struct(col("dim"), col("m")))),
        s => s.getField("m")).as("centroid"))

  /** Deterministic Achlioptas sparse JL matrix (Achlioptas 2003,
    * "Database-friendly random projections", public method): entries
    * {+s, −s, 0} with probability {1/6, 1/6, 2/3}, s = √(3/outDim).
    * Entry (i,j) derives from a pure-integer LCG of the flat index so
    * any engine regenerates the matrix from (dim, outDim, seed) alone —
    * no shipped state, and the SQL oracle can spell the same formula. */
  def jlMatrix(dim: Int, outDim: Int, seed: Long = 0L): Array[Array[Double]] = {
    val s = math.sqrt(3.0 / outDim)
    Array.tabulate(outDim, dim) { (j, i) =>
      val h = ((i.toLong * outDim + j + 1 + seed * 7919L) * 2654435761L) %
        2147483648L
      ((h / 1024) % 6) match { case 0 => s; case 1 => -s; case _ => 0.0 }
    }
  }

  /** Johnson–Lindenstrauss random projection: reduce `dim`-d float
    * embeddings to `outDim` dims with the [[jlMatrix]] — the standard
    * pre-step that makes downstream ANN / clustering / dedup sweeps
    * O(outDim) per distance instead of O(dim) while preserving pairwise
    * distances within (1±ε). Returns flattened (id, j, rp) rows (the
    * harness cannot sort array cells; callers wanting arrays can
    * `collect_list` over j).
    *
    * Scale shape: each output dim is one native [[graft.expressions.DotFExpr]]
    * kernel against a LITERAL matrix row — map-only, whole-stage
    * codegen, zero shuffle, no broadcast (the matrix lives in the plan,
    * outDim·dim doubles). At 100 TB this pipelines with the scan. */
  def randomProjection(
      emb: DataFrame, idCol: String, vecCol: String,
      dim: Int, outDim: Int, seed: Long = 0L): DataFrame = {
    val m = jlMatrix(dim, outDim, seed)
    val rps = (0 until outDim).map(j =>
      graft.expressions.DotFExpr.dotf(col(vecCol), typedLit(m(j).toSeq)))
    emb.select(col(idCol),
      posexplode(array(rps: _*)).as(Seq("j", "rp")))
  }

  /** IVF search against an explicit centroid codebook (e.g. from
    * [[kmeansCentroids]]); the index/probe dataflow is the same
    * assign → equi-join on cell → score as [[ivfTopK]]. */
  def ivfTopKWith(
      queries: DataFrame, corpus: DataFrame, cents: DataFrame,
      k: Int, nProbe: Int,
      qId: String = "q_id", qVec: String = "q_vec",
      cId: String = "c_id", cVec: String = "c_vec"): DataFrame = {
    def assign(df: DataFrame, id: String, vec: String, n: Int): DataFrame = {
      val w = Window.partitionBy(id)
        .orderBy(col("cent_cos").desc, col("cent_id"))
      df.crossJoin(broadcast(cents))
        .withColumn("cent_cos", cosineWithNorms(
          dotf(col(vec), col("cent_vec")),
          sqrt(dotf(col(vec), col(vec))),
          sqrt(dotf(col("cent_vec"), col("cent_vec")))))
        .withColumn("cell_rank", row_number().over(w))
        .filter(col("cell_rank") <= n)
        .select((col("cent_id").as("cell") +: df.columns.map(col)): _*)
    }
    val index = assign(corpus, cId, cVec, 1)
    val probes = assign(queries, qId, qVec, nProbe)
    val w = Window.partitionBy(qId).orderBy(col("cos").desc, col(cId))
    probes.join(index, "cell")
      .filter(col(qId) =!= col(cId))
      .select(col(qId), col(cId),
        cosineWithNorms(dotf(col(qVec), col(cVec)),
          sqrt(dotf(col(qVec), col(qVec))),
          sqrt(dotf(col(cVec), col(cVec)))).as("cos"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** IVF-PQ search (IVFADC — Jégou/Douze/Schmid 2011, "Product
    * Quantization for Nearest Neighbor Search"; the billion-scale
    * composition of [[ivfTopKWith]] and [[pqCodes]]): each corpus
    * vector assigns to ONE coarse cell (deterministic modulus-sample
    * codebook), its RESIDUAL x − c(cell) PQ-encodes to m sub-codes,
    * and a query probes its nProbe nearest cells scoring candidates
    * against the reconstruction x̂ = c(cell) + recon(codes).
    *
    * Scale: the index relation is (id, cell, m codes) — bytes per
    * vector instead of 4·dim — built in one broadcast-centroid map
    * pass + one map-only encode; the probe is an equi-join on cell
    * (never all-pairs), so per-query candidate work is
    * |corpus|·nProbe/nCells and the residual codebook is
    * catalog-scale driver state. Exact re-rank of the top-k against
    * raw vectors is the caller's optional second step.
    * Returns (q_id, c_id, rk, cos) with cos the ADC approximation. */
  def ivfPqTopK(
      queries: DataFrame, corpus: DataFrame, k: Int, nProbe: Int,
      nCells: Int, m: Int, rCodebook: Int = 8,
      qId: String = "q_id", qVec: String = "q_vec",
      cId: String = "c_id", cVec: String = "c_vec"): DataFrame = {
    val modulus = math.max(1L, corpus.count() / nCells)
    val cents = corpus.filter(col(cId) % modulus === 0)
      .select(col(cId).as("cent_id"),
        col(cVec).cast("array<double>").as("cent_vec"))
    def assign(df: DataFrame, id: String, vec: String, n: Int): DataFrame = {
      val w = Window.partitionBy(id)
        .orderBy(col("cent_cos").desc, col("cent_id"))
      df.crossJoin(broadcast(cents))
        .withColumn("cent_cos", cosineWithNorms(
          dotf(col(vec), col("cent_vec")),
          sqrt(dotf(col(vec), col(vec))),
          sqrt(dotf(col("cent_vec"), col("cent_vec")))))
        .withColumn("cell_rank", row_number().over(w))
        .filter(col("cell_rank") <= n)
        .select(col("cent_id").as("cell") +: col("cent_vec") +:
          df.columns.map(col): _*)
    }
    // index build: assign → residual → PQ-encode → reconstruct; the
    // coded relation persists (it IS the index — at scale it would be
    // the stored artifact, rebuilt only on corpus change)
    val resid = assign(corpus, cId, cVec, 1)
      .withColumn("__r",
        zip_with(col(cVec).cast("array<double>"), col("cent_vec"),
          (x, c) => x - c))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    KernelCaches.register(resid)
    val rcents = pqCodebook(
      resid.select(col(cId), col("__r")), cId, "__r", rCodebook)
    val codes = pqCodes(
      resid.select(col(cId), col("__r")), cId, "__r", rcents, m)
    val index = resid.select(col(cId), col("cell"), col("cent_vec"))
      .join(codes, cId)
      .select(col(cId), col("cell"),
        zip_with(col("cent_vec"), pqReconstruct(col("codes"), rcents, m),
          (c, r) => c + r).as("__rv"))
    val probes = assign(queries, qId, qVec, nProbe)
      .select(col("cell"), col(qId),
        col(qVec).cast("array<double>").as(qVec))
    val w = Window.partitionBy(qId).orderBy(col("cos").desc, col(cId))
    probes.join(index, "cell")
      .filter(col(qId) =!= col(cId))
      .select(col(qId), col(cId),
        cosineWithNorms(dotf(col(qVec), col("__rv")),
          sqrt(dotf(col(qVec), col(qVec))),
          sqrt(dotf(col("__rv"), col("__rv")))).as("cos"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Approximate near-dup pairs: hyperplane sign-bucket equi-join for
    * candidates, exact cosine re-score ≥ threshold. Sub-quadratic — the
    * cross join never materializes; recall is traded via `planes` (each
    * plane halves the expected bucket and the recall of wide-angle pairs).
    * At 100 TB: persist the bucketed corpus and scale planes ~log2(n) so
    * per-bucket candidate sets stay bounded. */
  def lshNearDupPairs(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, planes: Int, dim: Int): DataFrame = {
    val withB = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      lshBucket(col(vecCol), planes, dim).as("bucket"),
      sqrt(dotf(col(vecCol), col(vecCol))).as("nrm"))
    val a = withB.select(col("id").as("id_a"), col("v").as("va"),
      col("bucket"), col("nrm").as("na"))
    val b = withB.select(col("id").as("id_b"), col("v").as("vb"),
      col("bucket"), col("nrm").as("nb"))
    a.join(b, "bucket")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosineWithNorms(dotf(col("va"), col("vb")),
          col("na"), col("nb")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Exact all-pairs cosine ≥ threshold via BLOCK-TILED self-join — the
    * distributed dense kernel. Rows are grouped into `blocks` tiles
    * (pmod on id → even tiles); tile pairs (i ≤ j) meet through one
    * equi-free join of the packed tile relation with itself, and each
    * task scores its tile pair with a primitive-array double loop
    * (ascending-index double accumulation — bit-identical to [[dot]]
    * and the SQL oracles). O(n²) work — inherent to the exact problem —
    * but O(n·blocks) shuffle volume, no driver state, and ~100 ns/pair
    * instead of the µs-scale row-expression path.
    *
    * 100 TB: size `blocks` so a tile (n/blocks vectors) fits executor
    * memory; the tile-pair relation partitions evenly by construction.
    * mapPartitions-style imperative code is justified here: the inner
    * loop is a dense matmul tile no relational operator expresses. */
  def nearDupPairsBlocked(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, dim: Int = 64, blocks: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val tiles = df
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast(ArrayType(FloatType)).as("v"))
      .withColumn("bid", pmod(col("id"), lit(blocks)).cast("int"))
      .groupBy("bid")
      .agg(sort_array(collect_list(struct(col("id"), col("v")))).as("rows"))
    val pairsOfTiles = tiles
      .select($"bid".as("bid_a"), $"rows".as("rows_a"))
      .join(tiles.select($"bid".as("bid_b"), $"rows".as("rows_b")),
        col("bid_a") <= col("bid_b"))
      .as[TilePair]
    pairsOfTiles.flatMap { tp =>
      val ra = tp.rows_a
      val rb = tp.rows_b
      val same = tp.bid_a == tp.bid_b
      def norms(rs: Array[TileVec]): Array[Double] =
        rs.map { r =>
          var s = 0.0; var k = 0
          val v = r.v
          while (k < v.length) { s += v(k).toDouble * v(k).toDouble; k += 1 }
          math.sqrt(s)
        }
      val na = norms(ra)
      val nb = if (same) na else norms(rb)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
      var i = 0
      while (i < ra.length) {
        val va = ra(i).v
        val idA = ra(i).id
        var j = if (same) i + 1 else 0
        while (j < rb.length) {
          val vb = rb(j).v
          var s = 0.0; var k = 0
          while (k < va.length) { s += va(k).toDouble * vb(k).toDouble; k += 1 }
          val cos = s / (na(i) * nb(j))
          if (cos >= threshold)
            out += ((math.min(idA, rb(j).id), math.max(idA, rb(j).id), cos))
          j += 1
        }
        i += 1
      }
      out
    }.toDF("id_a", "id_b", "cos")
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): coarse-cluster the embedding space, then drop
    * every vector that has cosine ≥ `threshold` to a MORE CENTRAL
    * member of its own cluster (higher cosine to the shared centroid;
    * ties break to the smaller id). Each semantic blob keeps exactly
    * its most-central representative; cross-cluster pairs are never
    * scored — that bound is what makes the op sub-quadratic.
    *
    * Dataflow: centroids broadcast (fixed k, never corpus-sized);
    * assignment is one corpus scan + a many-group window (no corpus
    * shuffle); candidates come from a cluster-id equi-join (cluster-
    * bounded, never doc×doc); one distinct + left-anti join removes the
    * dropped ids. Returns (id, cluster, ccos) for the kept rows.
    *
    * 100 TB: scale k with corpus size (the paper runs k ≈ 0.1% of n)
    * so per-cluster cardinality stays bounded; `maxClusterSize` is the
    * opt-in runaway-cell guard — members beyond the cap (in id order)
    * skip pair generation, with the drop count logged. `cents` defaults
    * to the deterministic stride sample; pass [[kmeansCentroids]] for
    * the trained-codebook path — the dedup dataflow is identical. */
  def semanticDedup(
      corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, numCentroids: Int = 64,
      cents: Option[DataFrame] = None,
      maxClusterSize: Option[Int] = None): DataFrame = {
    val cs = cents.getOrElse {
      val modulus = math.max(1L, corpus.count() / numCentroids)
      corpus.filter(col(idCol) % modulus === 0)
        .select(col(idCol).as("cent_id"), col(vecCol).as("cent_vec"))
    }
    val w = Window.partitionBy(idCol)
      .orderBy(col("cent_cos").desc, col("cent_id"))
    val asgn0 = corpus.crossJoin(broadcast(cs))
      .withColumn("cent_cos", cosineWithNorms(
        dotf(col(vecCol), col("cent_vec")),
        sqrt(dotf(col(vecCol), col(vecCol))),
        sqrt(dotf(col("cent_vec"), col("cent_vec")))))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol).as("id"), col(vecCol).as("v"),
        col("cent_id").as("cluster"), col("cent_cos").as("ccos"),
        sqrt(dotf(col(vecCol), col(vecCol))).as("nrm"))
    val asgn = maxClusterSize match {
      case Some(cap) =>
        val wc = Window.partitionBy("cluster").orderBy(col("id"))
        val capped = asgn0.withColumn("__cn", row_number().over(wc))
        val over = capped.filter(col("__cn") > cap)
        val nOver = over.count()
        if (nOver > 0)
          org.apache.log4j.Logger.getLogger(getClass).warn(
            s"semanticDedup: $nOver members beyond maxClusterSize=$cap " +
              "excluded from pair generation (kept unconditionally)")
        capped.filter(col("__cn") <= cap).drop("__cn")
      case None => asgn0
    }
    val a = asgn.select(col("id").as("id_a"), col("v").as("va"),
      col("cluster"), col("ccos").as("ca"), col("nrm").as("na"))
    val b = asgn.select(col("id").as("id_b"), col("v").as("vb"),
      col("cluster"), col("ccos").as("cb"), col("nrm").as("nb"))
    val droppedIds = a.join(b, Seq("cluster"))
      .filter(col("id_a") =!= col("id_b"))
      .filter(cosineWithNorms(dotf(col("va"), col("vb")),
        col("na"), col("nb")) >= threshold)
      .filter(col("cb") > col("ca") ||
        (col("cb") === col("ca") && col("id_b") < col("id_a")))
      .select(col("id_a").as("id")).distinct()
    asgn0.join(droppedIds, Seq("id"), "left_anti")
      .select(col("id"), col("cluster"), col("ccos"))
  }

  /** Lexical top-k by distinct-token overlap — the sparse half of a
    * hybrid retrieval stack (swap BM25 in for graded relevance; the
    * overlap count keeps the ranking integer-exact). Queries carry a
    * pre-tokenized set column; the broadcast/scan/window dataflow is
    * [[bruteForceTopK]]'s. */
  def overlapTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      qId: String = "q_id", qSet: String = "q_toks",
      cId: String = "c_id", cSet: String = "c_toks"): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col(qId) =!= col(cId))
      .select(col(qId), col(cId),
        size(array_intersect(col(qSet), col(cSet))).as("ov"))
    val w = Window.partitionBy(qId).orderBy(col("ov").desc, col(cId))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009 — the
    * standard hybrid-retrieval combiner, e.g. dense + lexical): each
    * input ranking contributes 1/(k + rank) for the documents it
    * returned; fused score = the sum over systems, absent systems
    * contributing 0. Inputs are (q_id, c_id, rk) relations (rk
    * 1-based); returns (q_id, c_id, rrf).
    *
    * Determinism: terms are added in SYSTEM order via a chain of
    * full-outer joins (never a shuffled SUM), so the fp fold order is
    * pinned — for any number of systems both engines compute the same
    * double bit-for-bit.
    *
    * Scale: each ranking is |queries|·topN rows (candidate generation
    * has already cut the corpus), so the joins are query-scale — the
    * fusion itself never touches corpus-scale data. */
  def rrfFuse(rankings: Seq[DataFrame], k: Int = 60,
      qId: String = "q_id", cId: String = "c_id",
      rkCol: String = "rk"): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse: no rankings")
    val terms = rankings.zipWithIndex.map { case (r, i) =>
      r.select(col(qId), col(cId),
        (lit(1.0) / (lit(k.toDouble) + col(rkCol).cast("double")))
          .as(s"__t$i"))
    }
    val joined = terms.reduce((a, b) =>
      a.join(b, Seq(qId, cId), "full_outer"))
    val score = terms.indices
      .map(i => coalesce(col(s"__t$i"), lit(0.0)))
      .reduce(_ + _)
    joined.select(col(qId), col(cId), score.as("rrf"))
  }

}
