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
      i += 1
    }
    if (i == maxIterations)
      throw new IllegalStateException(
        s"recursive CTE did not converge in $maxIterations iterations")
    acc
  }

  /** UNION (distinct) variant: new rows are deduped against everything seen
    * so far (semi-naive evaluation — only genuinely-new rows recirculate). */
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
      i += 1
    }
    if (i == maxIterations)
      throw new IllegalStateException(
        s"recursive CTE did not converge in $maxIterations iterations")
    acc
  }
}
