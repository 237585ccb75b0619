package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Mirrors the role of GPDB's postmaster/QD setup (reference:
  * src/backend/tcop/postgres.c:1601 exec_simple_query) — but on Spark the
  * "cluster" is the SparkSession: driver = QD, executors = QE gangs, shuffle
  * = interconnect (reference: src/backend/cdb/motion/ic_udpifc.c).
  *
  * Scale posture: AQE on (runtime re-plan = ORCA's cost feedback loop),
  * shuffle partitions sized for the local harness via env; on a real
  * cluster this would be `spark.sql.adaptive.coalescePartitions` doing the
  * sizing. Session timezone pinned UTC for deterministic timestamp
  * semantics (GPDB `timezone` GUC analogue).
  */
object GraftSession {
  def builder(appName: String = "graft"): SparkSession.Builder = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    SparkSession.builder()
      .appName(appName)
      .withExtensions(new graft.expressions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // AQE's parallelism-first coalescing targets max(bytes/parallelism,
      // minPartitionSize). The 1 MB default floor collapses small-but-
      // compute-DENSE stages (shingle windows, token joins: ~14 MB of
      // strings ÷ 1 MB = 13 tasks on a 32-core box — half the cores
      // idle under heavy per-row string work). A lower floor is scale-
      // NEUTRAL: at 100 TB bytes/parallelism dwarfs any floor; locally
      // it lets the bytes/parallelism target actually apply (§2.2).
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PARTITION", "128k"))
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      // static conf, takes effect only when this builder CREATES the
      // session: the generated-class cache defaults to 100 entries, and a
      // 140-query sweep evicts constantly — every run then re-invokes
      // Janino instead of reusing warm classes (on a long-lived cluster
      // the same eviction churn shows up as steady-state compile load)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      // cost-based planning over ANALYZE-collected stats (reference:
      // optimizer/path/costsize.c consuming pg_statistic). Without an
      // ANALYZE nothing injects rowCounts and these are no-ops, so the
      // pre-stats plans are unchanged — a strict refinement.
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.joinReorder.enabled", "true")
      // FAIR scheduling so resource-queue statements land in per-queue
      // scheduler pools (ResourceQueues sets spark.scheduler.pool per
      // admitted statement); with a single pool this is FIFO-equivalent
      .config("spark.scheduler.mode",
        sys.env.getOrElse("SPARK_GRAFT_SCHED", "FAIR"))
      .config("spark.ui.enabled", "false")
      // Driver memory hygiene (guide §5): the status-store listeners run
      // even with the UI off and retain up to 1000 jobs/stages/SQL
      // executions — each SQL execution holds the full plan description
      // (MB-scale for the ML kernels; the "Truncated the string
      // representation of a plan" warning is that string being built).
      // A long-lived session executing hundreds of queries accumulates a
      // multi-GB live set that every GC then has to trace. Keep enough
      // for debugging, not an archive.
      .config("spark.ui.retainedJobs", "200")
      .config("spark.ui.retainedStages", "200")
      .config("spark.ui.retainedTasks", "20000")
      .config("spark.sql.ui.retainedExecutions", "50")
  }

  /** Local session for tests/bench; master only set if not already running. */
  def local(appName: String = "graft"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = builder(appName).master(s"local[$cpus]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    configure(spark)
    spark
  }

  /** Apply graft session conf + function registrations to an existing
    * session (e.g. the driver-created one passed into SparkEntry). */
  def configure(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    graft.functions.PgFunctions.registerAll(spark)
    spark
  }
}
