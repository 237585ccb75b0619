package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector kernels for the embedding operators (reference algebra:
  * gpcontrib/gp_sparse_vector/sparse_vector.h:125-146 svec_dot/l2norm).
  *
  * The declarative spellings ([[graft.operators.Similarity.dotFixed]],
  * `lshBucket`) unroll to hundreds of Catalyst nodes per call site —
  * numerically exact, but every invocation pays seconds of analysis /
  * optimization / codegen on trees that large, and with several dot
  * products per operator the plan overhead dwarfs the actual work.
  * These expressions compute the identical values (ascending-index
  * left-deep double accumulation — bit-equal to the unrolled chain and
  * the SQL oracles) as ONE plan node each, with a primitive loop in
  * both the interpreted and generated paths. */
case class DotFExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(t: DataType) = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dotf requires ARRAY<FLOAT|DOUBLE> inputs, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dotf"

  private def isF(e: Expression) =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  protected override def nullSafeEval(a: Any, b: Any): Any =
    DotFExpr.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isF(left), isF(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.DotFExpr.compute($a, $b, ${isF(left)}, ${isF(right)})")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotFExpr =
    copy(left = newLeft, right = newRight)
}

object DotFExpr {
  /** Σ a(i)·b(i) in ascending index order, double accumulation. */
  def compute(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  def dotf(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("dotf", a, b)
}

/** Count of positions where two LONG arrays hold equal values — the
  * native form of the unrolled 16-way element_at comparison chain in the
  * minhash estimator (identical values; min length if they differ). */
case class ArrEqCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(t: DataType) = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"arr_eq_count requires ARRAY<BIGINT> inputs, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "arr_eq_count"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    ArrEqCountExpr.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.ArrEqCountExpr.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrEqCountExpr =
    copy(left = newLeft, right = newRight)
}

object ArrEqCountExpr {
  def compute(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  def arrEqCount(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("arr_eq_count", a, b)
}

/** Sign-bucket id from `planes` deterministic hyperplanes — the native
  * form of [[graft.operators.Similarity.lshBucket]] (identical values:
  * same splitmix weights, same left-deep double dot, same sign rule). */
case class LshBucketExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _)
        if right.isInstanceOf[Literal] && right.dataType == IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "lsh_bucket requires (ARRAY<FLOAT|DOUBLE>, literal INT planes)")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lsh_bucket"

  private def isF =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  protected override def nullSafeEval(v: Any, p: Any): Any =
    LshBucketExpr.compute(v.asInstanceOf[ArrayData], p.asInstanceOf[Int], isF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, p) =>
      s"graft.expressions.LshBucketExpr.compute($v, $p, $isF)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LshBucketExpr =
    copy(left = newLeft, right = newRight)
}

object LshBucketExpr {
  // memoized per-(planes, dim) weight matrix — catalog-scale metadata
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(Int, Int), Array[Array[Double]]]

  private def weights(planes: Int, dim: Int): Array[Array[Double]] =
    cache.getOrElseUpdate((planes, dim),
      Array.tabulate(planes, dim)((p, d) =>
        graft.operators.Similarity.planeWeight(p, d)))

  def compute(v: ArrayData, planes: Int, isFloat: Boolean): Long = {
    val dim = v.numElements()
    val w = weights(planes, dim)
    var bucket = 0L
    var p = 0
    while (p < planes) {
      val wp = w(p)
      var s = 0.0
      var i = 0
      while (i < dim) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        s += x * wp(i)
        i += 1
      }
      if (s >= 0) bucket += (1L << p)
      p += 1
    }
    bucket
  }

  def lshBucket(vec: Column, planes: Int): Column =
    org.apache.spark.sql.functions.call_function(
      "lsh_bucket", vec, org.apache.spark.sql.functions.lit(planes))
}
