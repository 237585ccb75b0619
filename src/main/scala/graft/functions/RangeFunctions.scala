package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PG range types (reference: utils/adt/rangetypes.c; int4range/tsrange
  * et al., catalog pg_range) lowered onto `struct(lower, upper)` columns
  * in canonical half-open `[lower, upper)` form — PG canonicalizes
  * discrete ranges the same way (rangetypes.c int4range_canonical:
  * '[a,b]' → '[a,b+1)'). Every operator below is a pure Column
  * expression (codegen'd, null-safe where PG is), so range predicates
  * participate in filter pushdown/whole-stage codegen — no UDFs.
  *
  * Empty ranges are represented by lower >= upper (PG normalizes to a
  * canonical empty; equality on empties should go through [[isEmpty]]).
  */
object RangeFunctions {

  /** Construct `[lo, hi)`. */
  def range(lo: Column, hi: Column): Column =
    struct(lo.as("lower"), hi.as("upper"))

  def lowerBound(r: Column): Column = r.getField("lower")
  def upperBound(r: Column): Column = r.getField("upper")

  def isEmpty(r: Column): Column = lowerBound(r) >= upperBound(r)

  /** `r @> x` — element containment (rangetypes.c elem_contained_by_range). */
  def containsElem(r: Column, x: Column): Column =
    !isEmpty(r) && lowerBound(r) <= x && x < upperBound(r)

  /** `r1 @> r2` — range containment (empty ranges are contained by all). */
  def containsRange(r1: Column, r2: Column): Column =
    isEmpty(r2) ||
      (!isEmpty(r1) &&
        lowerBound(r1) <= lowerBound(r2) && upperBound(r2) <= upperBound(r1))

  /** `r1 && r2` — overlap (range_overlaps). */
  def overlaps(r1: Column, r2: Column): Column =
    !isEmpty(r1) && !isEmpty(r2) &&
      lowerBound(r1) < upperBound(r2) && lowerBound(r2) < upperBound(r1)

  /** `r1 * r2` — intersection (range_intersect); may be empty. */
  def intersect(r1: Column, r2: Column): Column =
    range(greatest(lowerBound(r1), lowerBound(r2)),
      least(upperBound(r1), upperBound(r2)))

  /** `r1 + r2` — union of overlapping-or-adjacent ranges (range_union
    * errors on disjoint inputs; here: null, the non-throwing analogue). */
  def unionSpan(r1: Column, r2: Column): Column =
    when(overlaps(r1, r2) || adjacent(r1, r2) || isEmpty(r1) || isEmpty(r2),
      range(
        when(isEmpty(r1), lowerBound(r2))
          .when(isEmpty(r2), lowerBound(r1))
          .otherwise(least(lowerBound(r1), lowerBound(r2))),
        when(isEmpty(r1), upperBound(r2))
          .when(isEmpty(r2), upperBound(r1))
          .otherwise(greatest(upperBound(r1), upperBound(r2)))))

  /** `r1 -|- r2` — adjacency (range_adjacent): half-open ranges touch
    * exactly when one's upper equals the other's lower. */
  def adjacent(r1: Column, r2: Column): Column =
    !isEmpty(r1) && !isEmpty(r2) &&
      (upperBound(r1) === lowerBound(r2) || upperBound(r2) === lowerBound(r1))

  /** `r1 << r2` — strictly left (range_before). */
  def strictlyLeft(r1: Column, r2: Column): Column =
    !isEmpty(r1) && !isEmpty(r2) && upperBound(r1) <= lowerBound(r2)

  /** `r1 -​ r2` — difference lower part kept (range_minus keeps the
    * piece(s) of r1 not in r2; like PG it is only defined when the
    * result is a single contiguous range — null otherwise). */
  def minus(r1: Column, r2: Column): Column = {
    val noOverlap = !overlaps(r1, r2)
    val cutRight = // r2 covers r1's right side
      lowerBound(r2) > lowerBound(r1) && upperBound(r2) >= upperBound(r1)
    val cutLeft = // r2 covers r1's left side
      lowerBound(r2) <= lowerBound(r1) && upperBound(r2) < upperBound(r1)
    when(isEmpty(r1) || isEmpty(r2) || noOverlap, r1)
      .when(cutRight, range(lowerBound(r1), lowerBound(r2)))
      .when(cutLeft, range(upperBound(r2), upperBound(r1)))
      .when(containsRange(r2, r1), range(lowerBound(r1), lowerBound(r1)))
  }
}
