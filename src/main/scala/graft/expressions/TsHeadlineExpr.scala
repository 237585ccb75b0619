package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native `ts_headline` (reference: src/backend/tsearch/wparser_def.c
  * prsd_headline — cover-density window selection; src/backend/tsearch/
  * wparser.c ts_headline): pick the best match window for an AND query
  * over a document and mark the query terms with StartSel/StopSel.
  *
  * Snippet generation is a per-document scalar — the whole computation
  * lives inside the scan stage as ONE codegen'd pass per row: no token
  * explode, no shuffle, the shape a 100 TB search-result sweep needs.
  *
  * Published algorithm, restated so an independent SQL oracle can
  * replay it bit-for-bit (both sides implement THIS spec):
  *  1. tokens = the document split on single spaces, empties dropped
  *     (the corpus tokenization used across graft); matching is on
  *     lower(token), rendering keeps the original token.
  *  2. covers: at every position p whose token is a query term, the
  *     minimal window ending at p is [min over terms of the LATEST
  *     occurrence ≤ p, p] — valid once every term has occurred. (Every
  *     minimal cover ends at a term occurrence, so scanning the
  *     per-position last-seen table finds the global minimum; this is
  *     the standard reformulation of the two-pointer sweep.)
  *  3. best cover = lexicographic min of (length, start, end).
  *  4. the window extends RIGHT to MaxWords tokens, then LEFT with any
  *     remainder (PG widens the cover the same way, wparser_def.c
  *     mark_hl_fragments).
  *  5. render the window's tokens space-joined, each term occurrence
  *     wrapped StartSel·token·StopSel.
  * Documents that never complete a cover (some term absent) yield NULL
  * (PG falls back to a headline-less prefix; callers here filter on
  * match instead — documented divergence).
  */
case class TsHeadlineExpr(
    child: Expression,
    terms: Seq[String],
    maxWords: Int,
    startSel: String,
    stopSel: String) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"ts_headline requires STRING input, got ${child.dataType.sql}")
    else if (terms.isEmpty)
      TypeCheckResult.TypeCheckFailure("ts_headline requires query terms")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "ts_headline"

  private lazy val termsArr: Array[String] =
    terms.map(_.toLowerCase).toArray

  protected override def nullSafeEval(input: Any): Any =
    TsHeadlineExpr.compute(input.asInstanceOf[UTF8String].toString,
      termsArr, maxWords, startSel, stopSel)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val termsRef = ctx.addReferenceObj("terms", termsArr,
      "java.lang.String[]")
    val startRef = ctx.addReferenceObj("startSel", startSel,
      "java.lang.String")
    val stopRef = ctx.addReferenceObj("stopSel", stopSel,
      "java.lang.String")
    nullSafeCodeGen(ctx, ev, c => s"""
      |UTF8String hl = graft.expressions.TsHeadlineExpr.compute(
      |  $c.toString(), $termsRef, $maxWords, $startRef, $stopRef);
      |if (hl == null) { ${ev.isNull} = true; } else { ${ev.value} = hl; }
      |""".stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): TsHeadlineExpr = copy(child = newChild)
}

object TsHeadlineExpr {

  /** One-pass cover scan per the spec in the class doc. Returns null
    * when no full cover exists. */
  def compute(text: String, terms: Array[String], maxWords: Int,
      startSel: String, stopSel: String): UTF8String = {
    val raw = text.split(" ")
    // tokens with empties dropped; lower() once for matching
    var n = 0
    var i = 0
    while (i < raw.length) { if (raw(i).nonEmpty) n += 1; i += 1 }
    if (n == 0) return null
    val toks = new Array[String](n)
    val lows = new Array[String](n)
    var j = 0
    i = 0
    while (i < raw.length) {
      if (raw(i).nonEmpty) {
        toks(j) = raw(i); lows(j) = raw(i).toLowerCase; j += 1
      }
      i += 1
    }
    // per-term last-seen; best (len, start, end) lexicographic min
    val last = Array.fill(terms.length)(-1)
    var bestLen = Int.MaxValue
    var bestStart = -1
    var bestEnd = -1
    var p = 0
    while (p < n) {
      var t = -1
      var k = 0
      while (t < 0 && k < terms.length) {
        if (lows(p) == terms(k)) t = k
        k += 1
      }
      if (t >= 0) {
        last(t) = p
        var start = Int.MaxValue
        var all = true
        k = 0
        while (k < terms.length) {
          if (last(k) < 0) all = false
          else if (last(k) < start) start = last(k)
          k += 1
        }
        if (all) {
          val len = p - start + 1
          if (len < bestLen ||
            (len == bestLen && (start < bestStart ||
              (start == bestStart && p < bestEnd)))) {
            bestLen = len; bestStart = start; bestEnd = p
          }
        }
      }
      p += 1
    }
    if (bestStart < 0) return null
    // widen right, then left, to maxWords
    val e = math.min(n - 1, bestEnd + math.max(0, maxWords - bestLen))
    val s = math.max(0,
      bestStart - math.max(0, maxWords - (e - bestStart + 1)))
    val sb = new java.lang.StringBuilder
    i = s
    while (i <= e) {
      if (i > s) sb.append(' ')
      var isTerm = false
      var k = 0
      while (!isTerm && k < terms.length) {
        if (lows(i) == terms(k)) isTerm = true
        k += 1
      }
      if (isTerm) sb.append(startSel).append(toks(i)).append(stopSel)
      else sb.append(toks(i))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}
