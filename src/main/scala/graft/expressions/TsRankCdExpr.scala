package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native `ts_rank_cd` — cover-density ranking (reference:
  * src/backend/utils/adt/tsrank.c calc_rank_cd / Cover): documents
  * rank by the density of minimal windows ("covers") containing every
  * query term. One codegen'd pass per row, map-only, like
  * [[TsHeadlineExpr]] (whose cover machinery this reuses).
  *
  * Published algorithm restated for engine-portable replay (both the
  * expression and the SQL oracle implement THIS spec):
  *  1. tokens = the document split on single spaces, empties dropped;
  *     matching on lower(token).
  *  2. covers: scan positions with a per-term last-seen table; once
  *     every term has occurred, each position p has a candidate window
  *     [s(p), p] with s(p) = min over terms of the latest occurrence
  *     ≤ p. The cover set = per distinct start, the smallest end —
  *     provably identical to tsrank.c's greedy Cover() enumeration
  *     (each greedy cover restarts at start+1, and candidate starts
  *     are non-decreasing in p, so "first end achieving each start"
  *     is exactly the greedy sequence).
  *  3. per cover: m = matched (any-term) positions inside the window,
  *     width = end − start + 1, noise = width − m. With PG's default
  *     all-'D' weights (0.1), InvSum = m/0.1 so the cover term
  *     m/InvSum = 0.1 regardless of m; contribution =
  *     0.1 / (1 + noise)   (tsrank.c: Cpos / (1 + nNoise)).
  *  4. rank = Σ contributions over covers. Each term is quantized to
  *     1e-6 fixed point (floor(x·1e6 + 0.5)) before summing so the
  *     total is an exact integer — summation order cannot perturb the
  *     result in either engine (the repo's fixed-point discipline).
  * No-match documents rank 0 (PG semantics). Weight labels (A–D),
  * normalization flags, and operator queries beyond implicit AND are
  * out of scope (documented; default method 0 only).
  */
case class TsRankCdExpr(child: Expression, terms: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"ts_rank_cd requires STRING input, got ${child.dataType.sql}")
    else if (terms.isEmpty)
      TypeCheckResult.TypeCheckFailure("ts_rank_cd requires query terms")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "ts_rank_cd"

  private lazy val termsArr: Array[String] =
    terms.map(_.toLowerCase).toArray

  protected override def nullSafeEval(input: Any): Any =
    TsRankCdExpr.compute(
      input.asInstanceOf[UTF8String].toString, termsArr)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val termsRef = ctx.addReferenceObj("terms", termsArr,
      "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.expressions.TsRankCdExpr.compute(
      |  $c.toString(), $termsRef);
      |""".stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): TsRankCdExpr = copy(child = newChild)
}

object TsRankCdExpr {

  /** One-pass cover-density scan per the spec in the class doc. */
  def compute(text: String, terms: Array[String]): Double = {
    val raw = text.split(" ")
    var n = 0
    var i = 0
    while (i < raw.length) { if (raw(i).nonEmpty) n += 1; i += 1 }
    if (n == 0) return 0.0
    val lows = new Array[String](n)
    var j = 0
    i = 0
    while (i < raw.length) {
      if (raw(i).nonEmpty) { lows(j) = raw(i).toLowerCase; j += 1 }
      i += 1
    }
    val last = Array.fill(terms.length)(-1)
    // matchedPrefix(i) = matched positions among the first i tokens
    val mp = new Array[Int](n + 1)
    var acc = 0L
    var prevStart = -1
    var p = 0
    while (p < n) {
      var t = -1
      var k = 0
      while (t < 0 && k < terms.length) {
        if (lows(p) == terms(k)) t = k
        k += 1
      }
      if (t >= 0) last(t) = p
      mp(p + 1) = mp(p) + (if (t >= 0) 1 else 0)
      var s = Int.MaxValue
      var all = true
      k = 0
      while (k < terms.length) {
        if (last(k) < 0) all = false
        else if (last(k) < s) s = last(k)
        k += 1
      }
      if (all && s != prevStart) {
        // first end achieving this start = the minimal cover for it
        prevStart = s
        val width = p - s + 1
        val m = mp(p + 1) - mp(s)
        val noise = width - m
        acc += math.floor(0.1 / (1 + noise) * 1e6 + 0.5).toLong
      }
      p += 1
    }
    acc / 1e6
  }
}
