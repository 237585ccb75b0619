package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** contrib/cube N-dimensional boxes (reference: contrib/cube/cube.c —
  * cube_dim/cube_contains/cube_overlap/cube_distance/cube_union/
  * cube_inter/cube_size/cube_enlarge/cube_is_point, cube.c:37-89).
  * A cube is struct(ll array<double>, ur array<double>) with ll[i] ≤
  * ur[i] normalized at construction (cube_in does the same corner
  * swap). Points are cubes with ll == ur.
  *
  * These are per-row array expressions (dims are small constants —
  * GiST-indexable cubes cap at 100 dims); the HOF folds run in index
  * order so any oracle replays the identical IEEE sequence. Scale:
  * map-only columns — filters and joins built on them (containment
  * pre-filters, distance ranges) compose with the usual equi-join /
  * broadcast kernels. */
object CubeFunctions {

  /** cube_in / cube_a_f8_f8: corners normalized per dimension. */
  def cube(lls: Seq[Column], urs: Seq[Column]): Column = {
    require(lls.size == urs.size, "cube: corner arity mismatch")
    struct(
      array(lls.zip(urs).map { case (l, u) =>
        least(l.cast("double"), u.cast("double")) }: _*).as("ll"),
      array(lls.zip(urs).map { case (l, u) =>
        greatest(l.cast("double"), u.cast("double")) }: _*).as("ur"))
  }

  /** cube_a_f8: a point cube (ll == ur). */
  def cubePoint(coords: Seq[Column]): Column = cube(coords, coords)

  def cubeDim(c: Column): Column = size(c("ll"))

  def cubeIsPoint(c: Column): Column =
    aggregate(zip_with(c("ll"), c("ur"), (l, u) => l === u),
      lit(true), (acc, x) => acc && x)

  def cubeLlCoord(c: Column, i: Int): Column = element_at(c("ll"), i)
  def cubeUrCoord(c: Column, i: Int): Column = element_at(c("ur"), i)

  /** `a @> b` (cube_contains): every dim of b inside a. */
  def cubeContains(a: Column, b: Column): Column =
    aggregate(
      zip_with(zip_with(a("ll"), b("ll"), (al, bl) => al <= bl),
        zip_with(a("ur"), b("ur"), (au, bu) => au >= bu),
        (x, y) => x && y),
      lit(true), (acc, x) => acc && x)

  /** `a && b` (cube_overlap): intervals intersect in every dim. */
  def cubeOverlap(a: Column, b: Column): Column =
    aggregate(
      zip_with(zip_with(a("ll"), b("ur"), (al, bu) => al <= bu),
        zip_with(b("ll"), a("ur"), (bl, au) => bl <= au),
        (x, y) => x && y),
      lit(true), (acc, x) => acc && x)

  /** `a <-> b` (cube_distance): euclidean over per-dim gaps — 0 where
    * the intervals overlap. Index-order sum, then one sqrt. */
  def cubeDistance(a: Column, b: Column): Column = {
    val gaps = zip_with(
      zip_with(a("ll"), a("ur"), (l, u) => struct(l.as("l"), u.as("u"))),
      zip_with(b("ll"), b("ur"), (l, u) => struct(l.as("l"), u.as("u"))),
      (x, y) => greatest(lit(0.0), x("l") - y("u"), y("l") - x("u")))
    sqrt(aggregate(gaps, lit(0.0), (acc, g) => acc + g * g))
  }

  /** cube_union: per-dim envelope. */
  def cubeUnion(a: Column, b: Column): Column = struct(
    zip_with(a("ll"), b("ll"), (x, y) => least(x, y)).as("ll"),
    zip_with(a("ur"), b("ur"), (x, y) => greatest(x, y)).as("ur"))

  /** cube_inter: per-dim intersection (cube.c keeps the possibly-empty
    * crossed corners, like PG). */
  def cubeInter(a: Column, b: Column): Column = struct(
    zip_with(a("ll"), b("ll"), (x, y) => greatest(x, y)).as("ll"),
    zip_with(a("ur"), b("ur"), (x, y) => least(x, y)).as("ur"))

  /** cube_size: volume — product of extents, index order. */
  def cubeSize(c: Column): Column =
    aggregate(zip_with(c("ll"), c("ur"), (l, u) => u - l),
      lit(1.0), (acc, e) => acc * e)

  /** cube_enlarge by r in every dim (negative r shrinks; crossing
    * corners collapse to the midpoint like cube.c:1794). */
  def cubeEnlarge(c: Column, r: Column): Column = struct(
    zip_with(c("ll"), c("ur"),
      (l, u) => when(l - r <= u + r, l - r).otherwise((l + u) / 2)).as("ll"),
    zip_with(c("ll"), c("ur"),
      (l, u) => when(l - r <= u + r, u + r).otherwise((l + u) / 2)).as("ur"))
}
