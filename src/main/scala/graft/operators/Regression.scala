package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.queries.Q

/** In-database multivariate linear regression — the MADlib
  * `linregr_train` surface (Hellerstein et al. 2012, "The MADlib
  * Analytics Library", public method; the reference warehouse ships
  * MADlib for exactly this) re-expressed as ONE Spark aggregate:
  * the OLS normal equations X'X b = X'y need only the second-moment
  * sums, so training is a single groupBy with map-side partial
  * aggregation and the solve is closed-form column algebra (Cramer's
  * rule for the 3×3 system) — no iteration, no driver math, no
  * collect.
  *
  * Scale: the shuffled state per group is 10 doubles regardless of row
  * count; 100 TB of rows train in one pass at scan speed. Sums use the
  * [[graft.queries.Q.dsum]] split-integer discipline so they are exact
  * and shuffle-order-independent — the fitted coefficients are
  * bit-reproducible across cluster sizes (MADlib's merge-state floats
  * are not). */
object Regression {

  /** det([a b c]) for column-vector triples, expanded in a FIXED
    * operation order both engines can spell identically. */
  private def det3(
      a: (Column, Column, Column), b: (Column, Column, Column),
      c: (Column, Column, Column)): Column =
    a._1 * (b._2 * c._3 - b._3 * c._2) -
      a._2 * (b._1 * c._3 - b._3 * c._1) +
      a._3 * (b._1 * c._2 - b._2 * c._1)

  /** Per-group OLS fit of `y ~ b0 + b1*x1 + b2*x2`. Returns one row per
    * group: (grp, n, b0, b1, b2, r2). Groups whose normal matrix is
    * singular (constant features, n < 3) yield NULL coefficients rather
    * than a division error. */
  def olsFit2(
      df: DataFrame, groupCol: String, yCol: String,
      x1Col: String, x2Col: String): DataFrame = {
    val (y, x1, x2) = (col(yCol), col(x1Col), col(x2Col))
    val agg = df.groupBy(col(groupCol).as("grp")).agg(
      count(lit(1)).cast("double").as("n"),
      Q.dsum(x1, 6).as("sx1"), Q.dsum(x2, 6).as("sx2"),
      Q.dsum(y, 6).as("sy"),
      Q.dsum(x1 * x1, 6).as("sx11"), Q.dsum(x2 * x2, 6).as("sx22"),
      Q.dsum(x1 * x2, 6).as("sx12"),
      Q.dsum(x1 * y, 6).as("sx1y"), Q.dsum(x2 * y, 6).as("sx2y"),
      Q.dsum(y * y, 6).as("syy"))
    val c0 = (col("n"), col("sx1"), col("sx2"))
    val c1 = (col("sx1"), col("sx11"), col("sx12"))
    val c2 = (col("sx2"), col("sx12"), col("sx22"))
    val r = (col("sy"), col("sx1y"), col("sx2y"))
    val det = det3(c0, c1, c2)
    val b0 = det3(r, c1, c2) / det
    val b1 = det3(c0, r, c2) / det
    val b2 = det3(c0, c1, r) / det
    val sse = col("syy") -
      (b0 * col("sy") + b1 * col("sx1y") + b2 * col("sx2y"))
    val sst = col("syy") - col("sy") * col("sy") / col("n")
    agg.select(col("grp"), col("n").cast("long").as("n"),
      when(abs(det) > lit(1e-9), b0).as("b0"),
      when(abs(det) > lit(1e-9), b1).as("b1"),
      when(abs(det) > lit(1e-9), b2).as("b2"),
      when(abs(det) > lit(1e-9) && sst > lit(0.0), lit(1.0) - sse / sst)
        .as("r2"))
  }

  /** Oracle-side SQL fragments mirroring [[olsFit2]] exactly — same
    * split-sum discipline, same det3 operation order — so a DuckDB
    * rendering of the fit hashes equal. `t` aliases the aggregated
    * sums CTE. */
  object Sql {
    def det3(a: Seq[String], b: Seq[String], c: Seq[String]): String =
      s"(${a(0)} * (${b(1)} * ${c(2)} - ${b(2)} * ${c(1)}) - " +
        s"${a(1)} * (${b(0)} * ${c(2)} - ${b(2)} * ${c(0)}) + " +
        s"${a(2)} * (${b(0)} * ${c(1)} - ${b(1)} * ${c(0)}))"
    val c0 = Seq("n", "sx1", "sx2")
    val c1 = Seq("sx1", "sx11", "sx12")
    val c2 = Seq("sx2", "sx12", "sx22")
    val r = Seq("sy", "sx1y", "sx2y")
  }
}
