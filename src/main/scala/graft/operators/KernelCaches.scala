package graft.operators

import org.apache.spark.sql.DataFrame

/** Pipeline-scope owner of kernel-internal caches.
  *
  * Dedup/similarity kernels cache signature and dictionary relations
  * that both sides of a self-join consume. Unpersisting them inside the
  * kernel would either recompute the intermediates (released before the
  * caller's action runs) or force an eager extra materialization of the
  * whole result (localCheckpoint) — for pair-set outputs in the millions
  * that second pass is the single largest avoidable cost. Instead the
  * kernels REGISTER their caches here and the pipeline driver (Bench,
  * Verify, a user's ETL loop) calls [[releaseAll]] after each consuming
  * action: caches live exactly as long as the query that needs them, and
  * a long-running session doing repeated dedup sweeps never accretes
  * executor storage.
  */
object KernelCaches {
  private val live = scala.collection.mutable.Buffer.empty[DataFrame]
  private val cleanups = scala.collection.mutable.Buffer.empty[() => Unit]

  def register(dfs: DataFrame*): Unit = synchronized { live ++= dfs }

  /** Register a deferred cleanup action to run at the next
    * [[releaseAll]] — teardown that belongs to pipeline scope, not to
    * the query's own timeline (e.g. the streaming state-store
    * provider unload: blocking the maintenance pool's shutdown inside
    * the query would bill fixed infrastructure teardown to the
    * measured run). */
  def registerCleanup(f: () => Unit): Unit = synchronized { cleanups += f }

  /** Release every registered cache (non-blocking) and run deferred
    * cleanups. Call after the action that consumes the kernel output. */
  def releaseAll(): Unit = synchronized {
    live.foreach(_.unpersist(blocking = false))
    live.clear()
    cleanups.foreach(f =>
      try f() catch { case _: Exception => () })
    cleanups.clear()
  }

  /** Number of currently registered caches (test visibility). */
  def liveCount: Int = synchronized(live.size)

  /** Persist an ITERATIVE kernel's working projection with enough
    * partitions to use the whole cluster, and register it here.
    *
    * Why (r10, measured): a small parquet source is one ROW GROUP, so
    * its scan — and therefore the cache built from it — is ONE
    * partition, and every per-epoch aggregate over it runs
    * single-threaded (q_ml_logreg_k spent ~1 s/epoch on a 600k-row
    * aggregate with 31 cores idle). Repartitioning UP to the default
    * parallelism costs one shuffle of the projection and parallelizes
    * every subsequent epoch scan. Only applies when the source has
    * fewer partitions than half the parallelism — at 100 TB inputs
    * arrive with thousands of row groups and this is a no-op (§2.2
    * scale-adaptive partitioning, not a local-mode constant). Values
    * are unaffected: every kernel aggregate is the exact split-sum
    * discipline, associative and order-independent. */
  def cacheParallel(df: DataFrame): DataFrame = {
    val cached = repartitionUp(df).persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    register(cached)
    cached
  }

  /** Repartition UP to the default parallelism when the source has
    * fewer partitions than half of it — the one-pass variant of
    * [[cacheParallel]] for CPU-heavy map work (hashing, parsing) over a
    * one-row-group source. No-op at scale; the local cost is one small
    * shuffle of the (already-pruned) input columns. */
  def repartitionUp(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val parts = df.rdd.getNumPartitions // builds the RDD, runs no job
    if (parts * 2 <= target) df.repartition(target) else df
  }
}
