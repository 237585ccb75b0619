package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-node PII scrub + audit: redacted text plus per-class occurrence
  * counts in a single expression (the TokenEntropyExpr discipline).
  *
  * The declarative spelling is 8 regex plan nodes — a 4-deep
  * regexp_replace chain materializing three intermediate strings plus 4
  * regexp_count passes. This computes the identical outputs with the
  * same 4 compiled java-regex patterns: counts run against the ORIGINAL
  * text (the audit contract), the replace chain runs in the same
  * email → ip → card → phone order (each later pattern cannot match
  * inside an earlier placeholder), so results are bit-identical to
  * [[graft.operators.TextAnalysis.redactPii]] / `piiCounts` and the SQL
  * oracles. Map-only; at 100 TB the per-row constant is the whole cost
  * of a scrub sweep. */
case class PiiScanExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pii_scan requires STRING input, got ${child.dataType.sql}")

  override def dataType: DataType = StructType(Seq(
    StructField("redacted", StringType, nullable = false),
    StructField("n_email", IntegerType, nullable = false),
    StructField("n_ip", IntegerType, nullable = false),
    StructField("n_card", IntegerType, nullable = false),
    StructField("n_phone", IntegerType, nullable = false)))

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pii_scan"

  protected override def nullSafeEval(input: Any): Any =
    PiiScanExpr.compute(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.PiiScanExpr.compute($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): PiiScanExpr =
    copy(child = newChild)
}

object PiiScanExpr {
  import graft.operators.TextAnalysis.{CardRe, EmailRe, Ipv4Re, PhoneRe}

  // same patterns, same order as TextAnalysis.redactPii
  private val Classes: Array[(java.util.regex.Pattern, String)] = Array(
    java.util.regex.Pattern.compile(EmailRe) -> "<EMAIL>",
    java.util.regex.Pattern.compile(Ipv4Re) -> "<IP>",
    java.util.regex.Pattern.compile(CardRe) -> "<CARD>",
    java.util.regex.Pattern.compile(PhoneRe) -> "<PHONE>")

  def compute(text: String): InternalRow = {
    val counts = new Array[Int](Classes.length)
    var cur = text
    var i = 0
    while (i < Classes.length) {
      val (p, repl) = Classes(i)
      val mc = p.matcher(text) // counts audit the UNREDACTED text
      var c = 0
      while (mc.find()) c += 1
      counts(i) = c
      cur = p.matcher(cur).replaceAll(repl)
      i += 1
    }
    new GenericInternalRow(Array[Any](UTF8String.fromString(cur),
      counts(0), counts(1), counts(2), counts(3)))
  }
}
