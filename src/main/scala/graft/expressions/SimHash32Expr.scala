package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: 32-bit SimHash of a text column in one
  * pass (tokenize → md5-derived token hash → per-bit majority vote).
  *
  * Same value as the declarative [[graft.operators.Dedup.simhashSignatures]]
  * pipeline and the DuckDB oracle (tokens = lowercased whitespace splits,
  * distinct; token hash = first 8 md5 hex chars), but computed per row
  * with no explode/shuffle — the shape a 100 TB fingerprinting scan wants.
  * doGenCode stays inside whole-stage codegen via a static call. */
case class SimHash32Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash32 requires STRING input, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash32"

  protected override def nullSafeEval(input: Any): Any =
    SimHash32Expr.compute(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.SimHash32Expr.compute($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): SimHash32Expr =
    copy(child = newChild)
}

object SimHash32Expr {
  /** One-pass simhash; tokenization mirrors TextAnalysis.tokens. */
  def compute(text: String): Long = {
    val seen = new java.util.HashSet[String]()
    val votes = new Array[Int](32)
    val md = java.security.MessageDigest.getInstance("MD5")
    text.toLowerCase.trim.split("\\s+").foreach { t =>
      if (t.nonEmpty && seen.add(t)) {
        val d = md.digest(t.getBytes("UTF-8"))
        // first 8 hex chars == first 4 bytes, big-endian
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        var j = 0
        while (j < 32) {
          votes(j) += (if (((h >> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
        md.reset()
      }
    }
    var sig = 0L
    var j = 0
    while (j < 32) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  /** Column form; resolves through the function registry (registered by
    * GraftExtensions / PgFunctions.registerAll). */
  def simhash32(c: Column): Column =
    org.apache.spark.sql.functions.call_function("simhash32", c)
}
