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
}
