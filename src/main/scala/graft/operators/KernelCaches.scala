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

  def register(dfs: DataFrame*): Unit = synchronized { live ++= dfs }

  /** Release every registered cache (non-blocking). Call after the
    * action that consumes the kernel output. */
  def releaseAll(): Unit = synchronized {
    live.foreach(_.unpersist(blocking = false))
    live.clear()
  }

  /** Number of currently registered caches (test visibility). */
  def liveCount: Int = synchronized(live.size)
}
