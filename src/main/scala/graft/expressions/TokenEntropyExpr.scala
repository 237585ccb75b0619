package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: per-document token statistics —
  * (n_tokens, n_distinct, Shannon entropy of the token distribution) —
  * in ONE pass over the text, no explode, no shuffle.
  *
  * Entropy is a per-document metric: a doc's tokens always fit locally,
  * so shipping every token through two hash shuffles (explode →
  * groupBy(doc,tok) → groupBy(doc)) does cluster-wide work for a
  * map-side statistic. This expression keeps the whole computation
  * inside the scan stage — the shape a 100 TB quality sweep wants.
  *
  * Exactness contract: per-token terms -p·log2(p) go through the same
  * fixed-point split-sum discipline as Q.dsum(_, 6) — each term is
  * floor(x*1e6 + 0.5) as a long, summed exactly, recombined via
  * BigDecimal — so the value is bit-identical to the declarative
  * explode/groupBy formulation and the DuckDB oracle, at any
  * parallelism. Tokenization mirrors TextAnalysis.tokens (lowercased
  * whitespace splits, empties dropped), like SimHash32Expr. */
case class TokenEntropyExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_entropy requires STRING input, got ${child.dataType.sql}")

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("entropy", DoubleType, nullable = false)))

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_entropy"

  protected override def nullSafeEval(input: Any): Any =
    TokenEntropyExpr.compute(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.TokenEntropyExpr.compute($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): TokenEntropyExpr =
    copy(child = newChild)
}

object TokenEntropyExpr {
  private val LOG2 = java.lang.Math.log(2.0)

  def compute(text: String): InternalRow = {
    val counts = new java.util.HashMap[String, Integer]()
    var nt = 0
    text.toLowerCase.trim.split("\\s+").foreach { t =>
      if (t.nonEmpty) {
        nt += 1
        val prev = counts.get(t)
        counts.put(t, if (prev == null) 1 else prev + 1)
      }
    }
    // Split-sum in fixed point: v = floor(term*1e6 + 0.5) per DISTINCT
    // token, summed as long (|term| ≤ log2(nt) ⇒ |v| ≤ ~2e7 per token —
    // no overflow for any realistic document).
    var sumV = 0L
    val it = counts.values().iterator()
    val ntD = nt.toDouble
    while (it.hasNext) {
      val p = it.next().intValue().toDouble / ntD
      val term = -(p * (java.lang.Math.log(p) / LOG2))
      sumV += java.lang.Math.floor(term * 1000000d + 0.5).toLong
    }
    // Recombine exactly like Q.dsum's DECIMAL(38,6)/1e6 cast-to-double
    val entropy = new java.math.BigDecimal(sumV).movePointLeft(6).doubleValue()
    new GenericInternalRow(Array[Any](nt, counts.size(), entropy))
  }

  /** Column form; resolves through the function registry. */
  def tokenEntropy(c: Column): Column =
    org.apache.spark.sql.functions.call_function("token_entropy", c)
}
