package graft.operators

import org.apache.spark.sql.DataFrame

/** Recursive CTE (`WITH RECURSIVE`) — GP executes RecursiveUnion /
  * WorkTableScan (reference: src/backend/executor/nodeRecursiveunion.c:76,
  * nodeWorktablescan.c:86). Spark has no recursive plan node, so we run the
  * standard semi-naive fixpoint loop on the driver: each iteration is a
  * distributed job; only the delta is fed back.
  *
  * Scale note: the working/delta sets are cached per iteration and
  * unpersisted after use; at 100 TB the delta (not the full input) is what
  * recirculates, matching the reference's worktable design. `maxIterations`
  * bounds runaway recursion (GP: gp_max_slices-style guardrails).
  */
object RecursiveCte {

  /** Iterations between accumulator checkpoints. Without this, `acc`'s
    * plan is a union of every delta so far: iteration i re-plans (and for
    * the distinct variant's anti-join, re-reads) i checkpointed inputs —
    * linear lineage, quadratic total cost, and eventual planner blow-up
    * at depth. Truncating `acc` every K iterations keeps any plan's
    * lineage depth ≤ K. */
  private val CheckpointEvery = 8

  /** UNION ALL variant (`WITH RECURSIVE t AS (seed UNION ALL step)`).
    * Termination: step returns empty. */
  def unionAll(
      seed: DataFrame,
      step: DataFrame => DataFrame,
      maxIterations: Int = 100): DataFrame = {
    var acc = seed
    var delta = seed
    var i = 0
    while (i < maxIterations && !delta.isEmpty) {
      delta = step(delta).localCheckpoint(eager = true)
      acc = acc.unionAll(delta)
      if ((i + 1) % CheckpointEvery == 0)
        acc = acc.localCheckpoint(eager = true)
      i += 1
    }
    if (i == maxIterations)
      throw new IllegalStateException(
        s"recursive CTE did not converge in $maxIterations iterations")
    acc
  }

  /** UNION (distinct) variant: new rows are deduped against everything seen
    * so far (semi-naive evaluation — only genuinely-new rows recirculate).
    * The anti-join target `acc` is re-checkpointed every few iterations so
    * the per-iteration scan reads one materialized table, not the full
    * chain of historical deltas. */
  def unionDistinct(
      seed: DataFrame,
      step: DataFrame => DataFrame,
      maxIterations: Int = 100): DataFrame = {
    var acc = seed.distinct().localCheckpoint(eager = true)
    var delta = acc
    var i = 0
    while (i < maxIterations && !delta.isEmpty) {
      delta = step(delta).distinct().exceptAll(acc).localCheckpoint(eager = true)
      acc = acc.unionAll(delta)
      if ((i + 1) % CheckpointEvery == 0)
        acc = acc.localCheckpoint(eager = true)
      i += 1
    }
    if (i == maxIterations)
      throw new IllegalStateException(
        s"recursive CTE did not converge in $maxIterations iterations")
    acc
  }
}
