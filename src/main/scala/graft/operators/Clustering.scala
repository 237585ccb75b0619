package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** k-means (Lloyd 1982) — MADlib `kmeans_*` parity (the reference
  * ships it as an in-database UDF suite; methods/kmeans in the MADlib
  * tree). Re-expressed as the standard distributed EM shape:
  *
  *   assign:  centroids broadcast as LITERAL arrays (k·dim doubles —
  *            catalog-scale, collected once per iteration like the
  *            stump's class totals); per-row distances are a
  *            zip_with+aggregate HOF over exact fixed-point terms —
  *            NOT unrolled columns: a k·dim unrolled tree blew
  *            Catalyst planning+janino past 5 s/job at any data size
  *            (measured r7, 20.1 s → 2.9 s after the switch; the
  *            per-row interpreted-lambda cost is ~13 µs and planning
  *            cost is per-query) — so assignment stays MAP-ONLY;
  *   update:  one (cluster, dim)-keyed aggregate per iteration — the
  *            only corpus-scale shuffle, map-side combinable, output
  *            k·dim rows (corpus-independent, the q_embed_pool shape).
  *
  * Determinism (cross-engine bit-parity, the repo's fixed-point
  * discipline): coordinates quantize to 1e-4 integers up front, so
  * centroid sums are EXACT longs and means are one double division;
  * per-dimension distance terms round to 1e-6 fixed-point longs before
  * summing, so the per-cluster distance is an exact integer and argmin
  * (dist, cluster) is engine-identical — no float summation order
  * anywhere. Initial centroids are the k lowest-id vectors (a
  * deterministic seeding; MADlib offers kmeans_random/kmeanspp —
  * random seeding has no cross-engine replay, documented divergence).
  *
  * At 100 TB: iters × (one scan + one k·dim-row shuffle); centroids
  * stay driver-side literals until k·dim outgrows broadcast size,
  * where the assignment switches to a co-partitioned join — the
  * PageRank broadcast→co-partition note applies verbatim.
  */
object Clustering {

  private val Scale = 10000L // 1e-4 coordinate quantization
  private val FpScale = 1e6 // distance-term fixed point

  /** Lloyd iterations over `vecCol` (float/double array, `dim` wide).
    * Returns (cluster, d, mu, n): final centroid coordinate per
    * dimension and the cluster's member count. */
  def kmeans(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, k: Int, iters: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // quantized corpus: (id, q longs). Map-only; reused every iteration.
    // floor(x·S + 0.5), not round(): identical on every engine (no
    // banker's/half-up ambiguity) — the quantizer is part of the spec
    // cached AND parallelized (r10): q feeds iters+2 full scans, each
    // paying the ~13 µs/row HOF distance — from a one-row-group parquet
    // source those scans were single-partition, i.e. single-threaded
    val q = KernelCaches.cacheParallel(
      df.select(col(idCol).cast("long").as("id"),
        transform(col(vecCol),
          x => floor(x.cast("double") * Scale + 0.5).cast("long")).as("q")))
    // init: the k lowest-id vectors, exactly as quantized
    val init: Map[Int, Array[Long]] = q.orderBy("id").limit(k).collect()
      .zipWithIndex.map { case (r, i) =>
        i -> r.getSeq[Long](1).toArray
      }.toMap
    var centroids: Map[Int, Array[Double]] =
      init.map { case (c, qs) => c -> qs.map(_.toDouble / Scale) }

    def assigned: DataFrame = {
      // per-cluster exact fixed-point distance: Σ_d round_fp((q_d/S −
      // μ_cd)²). zip_with+aggregate HOF, not unrolled columns: a k·dim
      // unrolled tree (256 element_at/floor terms) blew Catalyst's
      // planning+codegen past 5 s/JOB at ANY data size (measured r7) —
      // the interpreted-lambda cost the NOTES HOF-trap warns about is
      // ~13 µs/row here and stays map-only, the right trade for an
      // expression this wide. Terms are exact longs → any fold order.
      val dists: Seq[(Int, Column)] = centroids.toSeq.sortBy(_._1)
        .map { case (c, mu) =>
          val muArr = array(mu.map(lit).toIndexedSeq: _*)
          val dist = aggregate(
            zip_with($"q", muArr, (qi, m) => {
              val xd = qi.cast("double") / Scale.toDouble
              floor((xd - m) * (xd - m) * FpScale + 0.5).cast("long")
            }),
            lit(0L), (acc, t) => acc + t)
          c -> dist
        }
      // argmin (dist, cluster): fold a comparison chain over the k
      // distance columns — still map-only codegen
      val best = dists.tail.foldLeft(
        struct(dists.head._2.as("d"), lit(dists.head._1).as("c"))) {
        case (acc, (c, dc)) =>
          when(dc < acc.getField("d"),
            struct(dc.as("d"), lit(c).as("c"))).otherwise(acc)
      }
      q.withColumn("cluster", best.getField("c"))
    }

    var it = 0
    while (it < iters) {
      // the per-iteration corpus shuffle: (cluster, dim) keyed sums of
      // exact quantized longs → k·dim rows; counts per cluster ride
      // the d=0 rows
      val stats = assigned
        .select($"cluster", posexplode($"q").as(Seq("d", "qi")))
        .groupBy("cluster", "d")
        .agg(sum($"qi").as("s"), count(lit(1)).as("n"))
        .collect()
      val byCluster = stats.groupBy(_.getInt(0))
      centroids = byCluster.map { case (c, rows) =>
        val mu = new Array[Double](dim)
        var n = 0L
        rows.foreach { r =>
          n = r.getLong(3)
          mu(r.getInt(1)) =
            r.getLong(2).toDouble / n / Scale.toDouble
        }
        c -> mu
      }
      it += 1
    }
    val sizes = assigned.groupBy("cluster").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // a cluster emptied by the FINAL assignment is absent from `sizes`
    // while still present in `centroids` (a normal Lloyd outcome) —
    // drop it, matching the oracle's inner join on the size relation
    centroids.toSeq.sortBy(_._1).flatMap { case (c, mu) =>
      val n = sizes.getOrElse(c, 0L)
      if (n == 0L) Nil
      else mu.zipWithIndex.map { case (m, d) => (c, d, m, n) }
    }.toDF("cluster", "d", "mu", "n")
      .orderBy("cluster", "d")
  }

  /** DBSCAN (Ester et al. 1996; MADlib dbscan) over integer plane
    * coordinates — core points have ≥ `minPts` neighbors within `eps`
    * (self included), clusters are connected components of the
    * core-core ε-graph, border points adopt the smallest neighboring
    * core's cluster, the rest is noise (cluster −1).
    *
    * Scale shape: the ε-neighbor join is GRID-BUCKETED — each point
    * probes its 3×3 neighborhood of eps-sized cells, so candidate
    * generation is an equi-join on cell keys, never point×point
    * (the classic grid optimization; exact, since any pair within ε
    * differs by ≤1 cell per axis). Components reuse the O(log d)
    * label-propagation kernel. All geometry is exact int64 arithmetic
    * (squared distances) — no floats anywhere, so the clustering is
    * engine-identical by construction. */
  def dbscan(df: DataFrame, idCol: String, xCol: String, yCol: String,
      eps: Long, minPts: Int): DataFrame = {
    val pts = df.select(col(idCol).cast("long").as("id"),
      col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
    val cell = pts
      .withColumn("cx", floor(col("x").cast("double") / eps).cast("long"))
      .withColumn("cy", floor(col("y").cast("double") / eps).cast("long"))
    val offs = array((-1L to 1L).map(lit): _*)
    val probe = cell
      .select(col("id").as("ida"), col("x").as("xa"), col("y").as("ya"),
        col("cx"), col("cy"), explode(offs).as("ox"))
      .select(col("ida"), col("xa"), col("ya"),
        (col("cx") + col("ox")).as("jcx"), col("cy"), explode(offs).as("oy"))
      .select(col("ida"), col("xa"), col("ya"), col("jcx"),
        (col("cy") + col("oy")).as("jcy"))
    val eps2 = eps * eps
    // consumed three times (neighbor counts, core-core edges, border
    // assignment) — cache pipeline-scoped, released by the driver's
    // KernelCaches.releaseAll like the other dedup kernels
    val pairs = probe.join(
      cell.select(col("id").as("idb"), col("x").as("xb"),
        col("y").as("yb"), col("cx").as("jcx"), col("cy").as("jcy")),
      Seq("jcx", "jcy"))
      .filter((col("xa") - col("xb")) * (col("xa") - col("xb")) +
        (col("ya") - col("yb")) * (col("ya") - col("yb")) <= eps2)
      .select("ida", "idb")
      .cache()
    KernelCaches.register(pairs)
    val counts = pairs.groupBy(col("ida").as("id"))
      .agg(count(lit(1)).as("nn"))
    val cores = counts.filter(col("nn") >= minPts).select("id")
    // clusters: components of the core-core ε-graph; an isolated core
    // is its own cluster
    val coreEdges = pairs
      .join(cores.select(col("id").as("ida")), "ida")
      .join(cores.select(col("id").as("idb")), "idb")
      .filter(col("ida") < col("idb"))
    val cc = Components.connectedComponents(coreEdges, "ida", "idb")
    val coreComp = cores
      .join(cc, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id"))
        .as("cluster"))
    // borders: non-core with a core neighbor → smallest such cluster
    val borderComp = pairs
      .join(coreComp.select(col("id").as("idb"), col("cluster")), "idb")
      .join(cores.select(col("id").as("ida")), Seq("ida"), "left_anti")
      .filter(col("ida") =!= col("idb"))
      .groupBy(col("ida").as("id"))
      .agg(min(col("cluster")).as("cluster"))
    val assignedPts = coreComp.withColumn("is_core", lit(true))
      .unionByName(borderComp.withColumn("is_core", lit(false)))
    pts.select("id").join(assignedPts, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("is_core"), lit(false)).as("is_core"),
        coalesce(col("cluster"), lit(-1L)).as("cluster"))
      .orderBy("id")
  }
}
