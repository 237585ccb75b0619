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
}
