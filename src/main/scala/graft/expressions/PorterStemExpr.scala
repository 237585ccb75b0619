package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Porter-stem one lowercased word — the
  * per-lexeme step of the `english` text-search configuration
  * (reference: src/backend/snowball/dict_snowball.c). A static-call
  * codegen body keeps stemming inside whole-stage codegen, so stemming
  * a 100 TB corpus stays a map-only scan stage with per-row constant
  * cost (same discipline as [[TokenEntropyExpr]]). */
case class PorterStemExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"porter_stem requires STRING input, got ${child.dataType.sql}")

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "porter_stem"

  protected override def nullSafeEval(input: Any): Any =
    PorterStemExpr.stemUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.PorterStemExpr.stemUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): PorterStemExpr =
    copy(child = newChild)
}

object PorterStemExpr {
  def stemUtf8(s: UTF8String): UTF8String =
    UTF8String.fromString(graft.functions.PorterStemmer.stem(s.toString))

  /** Column form; resolves through the function registry. */
  def porterStem(c: Column): Column =
    org.apache.spark.sql.functions.call_function("porter_stem", c)
}
