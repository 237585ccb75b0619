package graft.sql

import java.util.concurrent.Semaphore
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.SparkSession

/** GP resource queues + role assignment (reference
  * src/backend/commands/queue.c, grammar gram.y:1301-1357
  * CreateQueueStmt; option set queue.c:122-128: active_statements,
  * max_cost, min_cost, cost_overcommit, priority, memory_limit).
  *
  * Spark-first mapping:
  *  - ACTIVE_STATEMENTS → a counting semaphore gating statement
  *    *admission* at dialect dispatch — exactly where the reference
  *    takes its resqueue lock (ExecutorStart): over-limit statements
  *    WAIT, they are not rejected. Eagerly-executed statements (DML,
  *    CTAS, COPY, scripts) are fully covered; a plain SELECT holds its
  *    slot through planning and releases at return (lazy evaluation —
  *    documented divergence).
  *  - queue identity → `spark.scheduler.pool` local property, so jobs
  *    launched under a queued statement land in a fair-scheduler pool
  *    named after the queue (GraftSession runs FAIR mode).
  *  - MAX_COST / MIN_COST / PRIORITY / MEMORY_LIMIT → recorded and
  *    surfaced in pg_resqueue; the cost model they gate is Catalyst's
  *    (CBO), which has no user-facing cost ceiling — documented no-ops,
  *    like the planner GUCs.
  *
  * Reentrancy: nested dialect calls (scripts, prepared statements,
  * matview refresh) run under the slot already held by their top-level
  * statement — depth-tracked per thread, matching the reference where
  * nested SPI does not re-lock the queue.
  */
object ResourceQueues {

  final case class Queue(
      name: String,
      activeStatements: Int, // -1 = unlimited
      maxCost: Option[Double],
      minCost: Option[Double],
      costOvercommit: Boolean,
      priority: Option[String],
      memoryLimit: Option[String])

  private val queues =
    scala.collection.concurrent.TrieMap.empty[String, Queue]
  private val sems =
    scala.collection.concurrent.TrieMap.empty[String, Semaphore]
  private val running =
    scala.collection.concurrent.TrieMap.empty[String, AtomicInteger]
  private val roleQueue =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private val roles =
    scala.collection.mutable.LinkedHashSet.empty[String]
  // session role is per-thread (InheritableThreadLocal): one thread's
  // SET ROLE must not change admission or current_user identity for
  // statements dispatched concurrently on other threads. Child threads
  // inherit the role at spawn. Cross-thread limitation (a drop/reset on
  // one thread cannot clear another thread's live role) is documented
  // next to the lazy-evaluation divergence above.
  private val currentRole = new InheritableThreadLocal[Option[String]] {
    override def initialValue(): Option[String] = None
  }
  private val slotDepth = new ThreadLocal[Integer] {
    override def initialValue(): Integer = 0
  }

  def create(name: String, opts: Map[String, String]): Unit = {
    val key = name.toLowerCase
    if (queues.contains(key))
      throw new IllegalArgumentException(
        s"""resource queue "$name" already exists""")
    val q = fromOpts(key, opts)
    queues.put(key, q)
    if (q.activeStatements > 0)
      sems.put(key, new Semaphore(q.activeStatements, true))
    running.put(key, new AtomicInteger(0))
  }

  /** ALTER keeps waiters sane by swapping in a fresh semaphore sized to
    * the new limit (the reference updates rsqcountlimit in place; new
    * statements see the new limit, in-flight ones finish on the old). */
  def alter(name: String, opts: Map[String, String]): Unit = {
    val key = name.toLowerCase
    val old = queues.getOrElse(key, throw new IllegalArgumentException(
      s"""resource queue "$name" does not exist"""))
    val q = fromOpts(key, opts, base = Some(old))
    queues.put(key, q)
    if (q.activeStatements > 0)
      sems.put(key, new Semaphore(q.activeStatements, true))
    else sems.remove(key)
  }

  def drop(name: String): Unit = {
    val key = name.toLowerCase
    if (!queues.contains(key))
      throw new IllegalArgumentException(
        s"""resource queue "$name" does not exist""")
    val holders = roleQueue.collect { case (r, `key`) => r }
    if (holders.nonEmpty)
      throw new IllegalStateException(
        s"""resource queue "$name" is used by role${
          if (holders.size > 1) "s" else ""} ${holders.mkString(", ")}""")
    queues.remove(key); sems.remove(key); running.remove(key)
  }

  private def fromOpts(
      name: String, opts: Map[String, String],
      base: Option[Queue] = None): Queue = {
    val o = opts.map { case (k, v) => k.toLowerCase -> v }
    def num(k: String): Option[Double] = o.get(k).map(_.toDouble)
    Queue(
      name,
      o.get("active_statements").map(_.toDouble.toInt)
        .orElse(base.map(_.activeStatements)).getOrElse(-1),
      num("max_cost").orElse(base.flatMap(_.maxCost)),
      num("min_cost").orElse(base.flatMap(_.minCost)),
      o.get("cost_overcommit").map(_.toBoolean)
        .orElse(base.map(_.costOvercommit)).getOrElse(false),
      o.get("priority").map(_.toUpperCase)
        .orElse(base.flatMap(_.priority)),
      o.get("memory_limit").orElse(base.flatMap(_.memoryLimit)))
  }

  // ---- roles -------------------------------------------------------

  def createRole(name: String, queue: Option[String]): Unit = {
    val key = name.toLowerCase
    roles.synchronized(roles += key)
    queue.foreach(q => assignRole(key, q))
  }

  def assignRole(role: String, queue: String): Unit = {
    val qk = queue.toLowerCase
    if (!queues.contains(qk))
      throw new IllegalArgumentException(
        s"""resource queue "$queue" does not exist""")
    roles.synchronized(roles += role.toLowerCase)
    roleQueue.put(role.toLowerCase, qk)
  }

  /** ALTER ROLE ... RESOURCE QUEUE NONE — keep the role, drop the
    * queue binding. */
  def unassignRole(role: String): Unit = {
    roles.synchronized(roles += role.toLowerCase)
    roleQueue.remove(role.toLowerCase)
  }

  def dropRole(name: String): Unit = {
    roles.synchronized(roles -= name.toLowerCase)
    roleQueue.remove(name.toLowerCase)
    if (currentRole.get.contains(name.toLowerCase)) currentRole.set(None)
  }

  def setRole(name: Option[String]): Unit = name match {
    case Some(r) =>
      val key = r.toLowerCase
      if (!roles.synchronized(roles.contains(key)))
        throw new IllegalArgumentException(s"""role "$r" does not exist""")
      currentRole.set(Some(key))
    case None => currentRole.set(None)
  }

  def sessionRole: Option[String] = currentRole.get

  // ---- admission ---------------------------------------------------

  /** Run `body` under the session role's queue slot: blocks while the
    * queue is at ACTIVE_STATEMENTS, tags spawned jobs with the queue's
    * scheduler pool. No queue (or nested call) → straight through. */
  def withSlot[T](spark: SparkSession)(body: => T): T = {
    val q = currentRole.get.flatMap(roleQueue.get)
    if (q.isEmpty || slotDepth.get() > 0) {
      slotDepth.set(slotDepth.get() + 1)
      try body finally slotDepth.set(slotDepth.get() - 1)
    } else {
      val key = q.get
      val sem = sems.get(key)
      sem.foreach(_.acquire())
      // guard the counter lookup: a concurrent DROP QUEUE can remove the
      // entry between admission and bookkeeping — never leak the permit
      running.get(key).foreach(_.incrementAndGet())
      val sc = spark.sparkContext
      val prevPool = sc.getLocalProperty("spark.scheduler.pool")
      sc.setLocalProperty("spark.scheduler.pool", key)
      slotDepth.set(slotDepth.get() + 1)
      try body finally {
        slotDepth.set(slotDepth.get() - 1)
        sc.setLocalProperty("spark.scheduler.pool", prevPool)
        running.get(key).foreach(_.decrementAndGet())
        sem.foreach(_.release())
      }
    }
  }

  // ---- introspection (pg_resqueue, gp_toolkit.gp_resqueue_status) --

  def all: Seq[Queue] = queues.values.toSeq.sortBy(_.name)

  def inFlight(name: String): Int =
    running.get(name.toLowerCase).map(_.get()).getOrElse(0)

  def roleRows: Seq[(String, Option[String])] =
    roles.synchronized(roles.toSeq).sorted.map(r => r -> roleQueue.get(r))

  /** Test/reset hook: forget every queue, role, and session role. */
  def reset(): Unit = {
    queues.clear(); sems.clear(); running.clear()
    roleQueue.clear(); roles.synchronized(roles.clear())
    currentRole.set(None)
  }
}
