package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Sparse dot product over COO-form vectors (reference:
  * gpcontrib/gp_sparse_vector/sparse_vector.h:125-146 svec_dot — the
  * RLE svec re-expressed as (ascending index array, value array), the
  * Spark-idiomatic sparse form).
  *
  * Σ over indices present in BOTH vectors of a·b, accumulated in
  * ascending index order — bit-equal to a dense dot over the
  * zero-filled vectors (adding +0.0 terms is an exact identity), which
  * is exactly how the SQL oracles spell it. One plan node, primitive
  * merge loop in both interpreted and generated paths — the [[DotFExpr]]
  * pattern. */
case class SvecDotExpr(
    first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  private def idxOk(t: DataType) = t match {
    case ArrayType(IntegerType, _) => true
    case _ => false
  }
  private def valOk(t: DataType) = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (idxOk(first.dataType) && valOk(second.dataType) &&
      idxOk(third.dataType) && valOk(fourth.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "svec_dot requires (ARRAY<INT>, ARRAY<DOUBLE>) index/value pairs, " +
        s"got ${children.map(_.dataType.sql).mkString(", ")}")
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "svec_dot"

  protected override def nullSafeEval(
      ai: Any, av: Any, bi: Any, bv: Any): Any =
    SvecDotExpr.compute(
      ai.asInstanceOf[ArrayData], av.asInstanceOf[ArrayData],
      bi.asInstanceOf[ArrayData], bv.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (ai, av, bi, bv) =>
      s"graft.expressions.SvecDotExpr.compute($ai, $av, $bi, $bv)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): SvecDotExpr =
    copy(first = f, second = s, third = t, fourth = q)
}

object SvecDotExpr {
  /** Sorted-merge Σ a·b over common indices, ascending, double acc. */
  def compute(ai: ArrayData, av: ArrayData,
      bi: ArrayData, bv: ArrayData): Double = {
    val n = ai.numElements()
    val m = bi.numElements()
    var i = 0
    var j = 0
    var s = 0.0
    while (i < n && j < m) {
      val x = ai.getInt(i)
      val y = bi.getInt(j)
      if (x == y) { s += av.getDouble(i) * bv.getDouble(j); i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    s
  }
}
