package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal, TernaryExpression}
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

/** SQ8 scalar quantization: 1 byte per dimension against per-dimension
  * [mn, mx] ranges — the standard 4× compression for an embedding store
  * (FAISS ScalarQuantizer QT_8bit; IVF codebooks ship the same ranges).
  * code(i) = floor((x-mn)/(mx-mn)·255 + 0.5); floor(+0.5) rather than
  * round() so the rule is identical on every engine (no banker's-
  * rounding divergence). Encode → BINARY(dim); [[Sq8DecodeExpr]]
  * reconstructs mn + code/255·(mx-mn) as ARRAY<FLOAT>. */
case class Sq8EncodeExpr(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType | DoubleType, _),
            ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "sq8_encode requires (ARRAY<FLOAT|DOUBLE>, ARRAY<DOUBLE> mn, ARRAY<DOUBLE> mx)")
    }
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sq8_encode"

  private def isF =
    first.dataType.asInstanceOf[ArrayType].elementType == FloatType

  protected override def nullSafeEval(v: Any, mn: Any, mx: Any): Any =
    Sq8Expr.encode(v.asInstanceOf[ArrayData], mn.asInstanceOf[ArrayData],
      mx.asInstanceOf[ArrayData], isF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, mn, mx) =>
      s"graft.expressions.Sq8Expr.encode($v, $mn, $mx, $isF)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Sq8EncodeExpr =
    copy(first = f, second = s, third = t)
}

case class Sq8DecodeExpr(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (BinaryType, ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "sq8_decode requires (BINARY, ARRAY<DOUBLE> mn, ARRAY<DOUBLE> mx)")
    }
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sq8_decode"

  protected override def nullSafeEval(b: Any, mn: Any, mx: Any): Any =
    Sq8Expr.decode(b.asInstanceOf[Array[Byte]], mn.asInstanceOf[ArrayData],
      mx.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, mn, mx) =>
      s"graft.expressions.Sq8Expr.decode($b, $mn, $mx)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Sq8DecodeExpr =
    copy(first = f, second = s, third = t)
}

object Sq8Expr {
  def encode(v: ArrayData, mn: ArrayData, mx: ArrayData,
      isFloat: Boolean): Array[Byte] = {
    val n = v.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      val lo = mn.getDouble(i)
      val hi = mx.getDouble(i)
      val code =
        if (hi == lo) 0.0
        else math.floor((x - lo) / (hi - lo) * 255.0 + 0.5)
      out(i) = math.max(0.0, math.min(255.0, code)).toInt.toByte
      i += 1
    }
    out
  }

  def decode(b: Array[Byte], mn: ArrayData,
      mx: ArrayData): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val n = b.length
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val code = (b(i) & 0xff).toDouble
      val lo = mn.getDouble(i)
      val hi = mx.getDouble(i)
      out(i) = (lo + code / 255.0 * (hi - lo)).toFloat
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def sq8Encode(v: Column, mn: Column, mx: Column): Column =
    org.apache.spark.sql.functions.call_function("sq8_encode", v, mn, mx)

  def sq8Decode(b: Column, mn: Column, mx: Column): Column =
    org.apache.spark.sql.functions.call_function("sq8_decode", b, mn, mx)
}
