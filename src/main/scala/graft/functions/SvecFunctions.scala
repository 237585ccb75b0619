package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Sparse-vector (svec) algebra (reference contrib
  * gpcontrib/gp_sparse_vector/sparse_vector.h: svec_dot, svec_l2norm,
  * svec_l1norm, svec_plus, operator surface in operators.c).
  *
  * The reference svec is a run-length-encoded double vector for
  * analytics over mostly-zero data; the Spark-idiomatic re-expression
  * is COO form — a strictly-ascending `ARRAY<INT>` of indices and a
  * parallel `ARRAY<DOUBLE>` of values. Construction and element-wise
  * maps are linear higher-order functions (fine off the hot path);
  * the pairwise kernel (dot) is the native codegen
  * [[graft.expressions.SvecDotExpr]], mirroring the dense DotF split.
  */
object SvecFunctions {

  /** Dense → sparse: indices (0-based, ascending) where |x| > eps, and
    * their values as doubles. Returns struct(idx, vals). */
  def svecFromDense(v: Column, eps: Double): (Column, Column) = {
    val idx = filter(
      sequence(lit(0), size(v) - 1),
      i => abs(element_at(v, i + 1).cast("double")) > eps)
    val vals = transform(idx, i => element_at(v, i + 1).cast("double"))
    (idx, vals)
  }

  /** svec_dot: merge-join Σ over common indices (native kernel). */
  def svecDot(aIdx: Column, aVal: Column, bIdx: Column, bVal: Column): Column =
    call_function("svec_dot", aIdx, aVal, bIdx, bVal)

  /** svec_l2norm = sqrt(dot(v, v)). */
  def svecL2norm(idx: Column, vals: Column): Column =
    sqrt(svecDot(idx, vals, idx, vals))

  /** svec_l1norm: Σ |v| in index order. */
  def svecL1norm(vals: Column): Column =
    aggregate(vals, lit(0.0), (acc, x) => acc + abs(x))

  /** Number of stored entries. */
  def svecNnz(idx: Column): Column = size(idx)

  /** Scalar scale: values × c (indices unchanged). */
  def svecScale(vals: Column, c: Column): Column =
    transform(vals, x => x * c)

  /** svec_plus: element-wise union add. Entries that sum to exact 0.0
    * are KEPT (union support, as the reference's element-wise operators
    * preserve runs); map keys are re-sorted back to ascending COO.
    * Returns struct(idx, vals). */
  def svecPlus(
      aIdx: Column, aVal: Column,
      bIdx: Column, bVal: Column): (Column, Column) = {
    val merged = map_zip_with(
      map_from_arrays(aIdx, aVal),
      map_from_arrays(bIdx, bVal),
      (_, x, y) => coalesce(x, lit(0.0)) + coalesce(y, lit(0.0)))
    val entries = array_sort(map_entries(merged))
    (transform(entries, e => e.getField("key")),
      transform(entries, e => e.getField("value")))
  }
}
