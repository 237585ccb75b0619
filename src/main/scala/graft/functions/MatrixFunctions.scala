package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** GP matrix helpers over nested arrays (reference:
  * src/backend/utils/adt/matrix.c — matrix_add/matrix_multiply over
  * 2-D arrays). Matrices are `array<array<double>>`, row-major;
  * everything is codegen-able array expressions. */
object MatrixFunctions {

  /** Element-wise matrix addition. */
  def madd(a: Column, b: Column): Column =
    zip_with(a, b, (ra, rb) => zip_with(ra, rb, (x, y) => x + y))

  /** Scalar multiplication. */
  def mscale(a: Column, s: Column): Column =
    transform(a, r => transform(r, x => x * s))

  /** Matrix transpose for fixed dimensions (rows×cols known). */
  def mtranspose(a: Column, rows: Int, cols: Int): Column =
    array((1 to cols).map { j =>
      array((1 to rows).map(i => element_at(element_at(a, i), j)): _*)
    }: _*)

  /** Matrix product for fixed dimensions: a is n×m, b is m×p. */
  def mmul(a: Column, b: Column, n: Int, m: Int, p: Int): Column =
    array((1 to n).map { i =>
      array((1 to p).map { j =>
        (1 to m).map { k =>
          element_at(element_at(a, i), k) * element_at(element_at(b, k), j)
        }.reduce((x, y) => x + y)
      }: _*)
    }: _*)

  // ---- N-dim array surface (reference: arrayfuncs.c array_dims/
  // array_ndims/array slicing, funcapi generate_subscripts) -----------

  /** PG `array_dims` for a rectangular 2-D nested array: "[1:r][1:c]"
    * (lower bounds are always 1 on the Spark side — nested arrays have
    * no custom bounds). Dynamic dims, not compile-time. */
  def dims2d(a: Column): Column =
    concat(lit("[1:"), size(a).cast("string"), lit("][1:"),
      size(element_at(a, 1)).cast("string"), lit("]"))

  /** Nesting depth of a 2-D array column (PG array_ndims analogue; the
    * depth is a property of the column's TYPE, so it is a literal). */
  def ndims2d: Column = lit(2)

  /** PG 2-D slice `a[r1:r2][c1:c2]` with dynamic bounds (1-based,
    * inclusive, like PG): outer slice then per-row inner slice. */
  def slice2d(a: Column, r1: Column, r2: Column,
      c1: Column, c2: Column): Column =
    transform(slice(a, r1, r2 - r1 + lit(1)),
      row => slice(row, c1, c2 - c1 + lit(1)))

  /** PG `generate_subscripts(arr, dim)` for dim=1: the subscript range
    * of the outer dimension. Explode it for the SRF-in-FROM shape. */
  def generateSubscripts(a: Column): Column =
    sequence(lit(1), size(a))
}
