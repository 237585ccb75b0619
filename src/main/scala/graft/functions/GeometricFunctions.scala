package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PG geometric surface (reference: src/backend/utils/adt/geo_ops.c —
  * point `<->` distance, box `@>` containment / area / center, circle
  * containment / area). Points are (x, y) double pairs; a point column
  * renders as a struct (PG's `(x,y)` text form is a display detail).
  * Boxes normalize their corners like box_in does, so callers can pass
  * any two opposite corners. Everything is plain codegen'd arithmetic. */
object GeometricFunctions {

  def point(x: Column, y: Column): Column =
    struct(x.as("x"), y.as("y"))

  /** `point <-> point` — euclidean distance (point_distance). */
  def pointDistance(x1: Column, y1: Column, x2: Column, y2: Column): Column =
    sqrt((x1 - x2) * (x1 - x2) + (y1 - y2) * (y1 - y2))

  /** `box @> point` (box_contain_pt) — corners normalized first. */
  def boxContainsPoint(
      bx1: Column, by1: Column, bx2: Column, by2: Column,
      px: Column, py: Column): Column =
    px >= least(bx1, bx2) && px <= greatest(bx1, bx2) &&
      py >= least(by1, by2) && py <= greatest(by1, by2)

  /** `area(box)` (box_area). */
  def boxArea(bx1: Column, by1: Column, bx2: Column, by2: Column): Column =
    abs((bx2 - bx1) * (by2 - by1))

  /** `center(box)` (box_center). */
  def boxCenter(bx1: Column, by1: Column, bx2: Column, by2: Column): Column =
    point((bx1 + bx2) / 2, (by1 + by2) / 2)

  /** `circle @> point` (circle_contain_pt): distance to center ≤ r. */
  def circleContainsPoint(
      cx: Column, cy: Column, r: Column, px: Column, py: Column): Column =
    pointDistance(cx, cy, px, py) <= r

  /** `area(circle)` (circle_area). */
  def circleArea(r: Column): Column = lit(math.Pi) * r * r

  // ---- polygon / path subset (geo_ops.c poly_contain / poly_distance
  // / path_length family). Vertices ride as PARALLEL double arrays
  // (xs, ys) — every function below is array higher-order functions
  // over the edge index, so the whole computation is one codegen'd
  // scalar per row: no explode, no shuffle, generic in vertex count. --

  /** Edge-indexed transform over a vertex ring: `f(x1, y1, x2, y2)` per
    * edge i → (i+1) mod n (closed) or i → i+1 (open path). */
  private def perEdge(xs: Column, ys: Column, closed: Boolean)(
      f: (Column, Column, Column, Column) => Column): Column = {
    val n = size(xs)
    val m = if (closed) n else n - 1
    transform(sequence(lit(0), m - 1), i => {
      val j = (i + 1) % n
      f(element_at(xs, i + 1), element_at(ys, i + 1),
        element_at(xs, j + 1), element_at(ys, j + 1))
    })
  }

  /** `area(polygon)` — the shoelace formula (poly_area):
    * |Σ xᵢ·yⱼ − xⱼ·yᵢ| / 2 over the closed ring. */
  def polyArea(xs: Column, ys: Column): Column = {
    val terms = perEdge(xs, ys, closed = true)(
      (x1, y1, x2, y2) => x1 * y2 - x2 * y1)
    abs(aggregate(terms, lit(0.0), (acc, t) => acc + t)) / 2
  }

  /** `length(path)` (path_length) — Σ segment lengths; `closed` adds
    * the wrap-around segment (a polygon's perimeter). */
  def pathLength(xs: Column, ys: Column, closed: Boolean): Column = {
    val segs = perEdge(xs, ys, closed)((x1, y1, x2, y2) =>
      sqrt((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1)))
    aggregate(segs, lit(0.0), (acc, s) => acc + s)
  }

  /** `perimeter(polygon)`. */
  def polyPerimeter(xs: Column, ys: Column): Column =
    pathLength(xs, ys, closed = true)

  /** `polygon @> point` (poly_contain_pt → point_inside): even-odd ray
    * casting, DIVISION-FREE — the crossing test
    * `px < x1 + (x2−x1)(py−y1)/(y2−y1)` is cross-multiplied and
    * sign-corrected, so no edge ever divides (horizontal edges fail
    * the straddle test first) and both engines compute the identical
    * exact comparison. */
  def polyContainsPoint(
      xs: Column, ys: Column, px: Column, py: Column): Column = {
    val crossings = perEdge(xs, ys, closed = true)((x1, y1, x2, y2) =>
      when(((y1 > py) =!= (y2 > py)) &&
        ((px - x1) * (y2 - y1) - (x2 - x1) * (py - y1)) *
          signum(y2 - y1) < 0, 1).otherwise(0))
    aggregate(crossings, lit(0), (acc, c) => acc + c) % 2 === 1
  }

  /** `path/polygon <-> point` (dist_ppath / poly_distance to a point):
    * min over segments of the clamped-projection point-segment
    * distance. Degenerate zero-length segments fall back to the
    * vertex distance (t = 0). */
  def pathPointDistance(xs: Column, ys: Column, px: Column, py: Column,
      closed: Boolean): Column = {
    val dists = perEdge(xs, ys, closed) { (x1, y1, x2, y2) =>
      val l2 = (x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1)
      val tRaw = ((px - x1) * (x2 - x1) + (py - y1) * (y2 - y1)) / l2
      val t = when(l2 > 0,
        greatest(lit(0.0), least(lit(1.0), tRaw))).otherwise(lit(0.0))
      val cx = x1 + t * (x2 - x1)
      val cy = y1 + t * (y2 - y1)
      sqrt((px - cx) * (px - cx) + (py - cy) * (py - cy))
    }
    array_min(dists)
  }
}
