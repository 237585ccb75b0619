package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native `ts_rank` — the standard (non-cover-density) tsquery rank
  * (reference: src/backend/utils/adt/tsrank.c calc_rank /
  * calc_rank_and / calc_rank_or / word_distance). One codegen'd pass
  * per row, default weights (all positions 'D' = 0.1), method 0.
  *
  * Published algorithm restated for engine-portable replay:
  *  - tokens = the document split on single spaces (empties dropped),
  *    matching on lower(token); a term's positions are its 1-based
  *    token indexes. Query terms are deduped and sorted (tsrank.c
  *    SortAndUniqItems sorts unique operands).
  *  - ONE distinct term (calc_rank_or): for n occurrences,
  *    resj = Σ_{j=0}^{n−1} 0.1/((j+1)·(j+1)), and the rank is
  *    (0.1 + resj − 0.1/1) / 1.64493406685 (the wjm algebra with all
  *    weights equal; 1.64493406685 ≈ π²/6 is the series limit), then
  *    divided by the term count (1). Absent term → 0.
  *  - TWO OR MORE distinct terms (calc_rank_and): over every
  *    cross-term position pair (term i, term k<i in sorted order;
  *    l over i's positions ascending, p over k's ascending),
  *    dist = |pos_l − pos_p| and
  *    curw = sqrt(0.1 · 0.1 · word_distance(dist)) with
  *    word_distance(d) = 1/(1.005 + 0.05·e^{d/1.5−2}) for d ≤ 100,
  *    else 1e-30. rank = 1 − Π(1 − curw), folded LEFT in (i,k,l,p)
  *    order; a document lacking a full pair set ranks 1e-20 (PG's
  *    clamp). CROSS-ENGINE DETERMINISM: curw depends only on dist, so
  *    the 101 possible values are TABULATED once (JVM, 17 significant
  *    digits) and the oracle receives the same decimal literals —
  *    both engines then run identical IEEE multiplies in identical
  *    order; no transcendental function executes at query time.
  * Weight labels and normalization flags are out of scope (documented;
  * same contract as ts_rank_cd). */
case class TsRankExpr(child: Expression, terms: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"ts_rank requires STRING input, got ${child.dataType.sql}")
    else if (terms.isEmpty)
      TypeCheckResult.TypeCheckFailure("ts_rank requires query terms")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "ts_rank"

  private lazy val termsArr: Array[String] =
    terms.map(_.toLowerCase).distinct.sorted.toArray

  protected override def nullSafeEval(input: Any): Any =
    TsRankExpr.compute(input.asInstanceOf[UTF8String].toString, termsArr)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val termsRef = ctx.addReferenceObj("terms", termsArr,
      "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.expressions.TsRankExpr.compute(
      |  $c.toString(), $termsRef);
      |""".stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): TsRankExpr = copy(child = newChild)
}

object TsRankExpr {

  /** curw(dist) = sqrt(0.1·0.1·word_distance(dist)) tabulated for
    * dist 1..100; index 0 unused; index 101 = the >100 clamp
    * (word_distance 1e-30 ⇒ curw 1e-16). The same values render into
    * the SQL oracle as decimal literals via [[curwLiterals]]. */
  val Curw: Array[Double] = {
    val a = new Array[Double](102)
    var d = 1
    while (d <= 100) {
      val wd = 1.0 / (1.005 + 0.05 * math.exp(d.toDouble / 1.5 - 2.0))
      a(d) = math.sqrt(0.1 * 0.1 * wd)
      d += 1
    }
    a(101) = math.sqrt(0.1 * 0.1 * 1e-30)
    a
  }

  /** The table as 17-significant-digit literals (round-trips to the
    * identical double in any IEEE engine) — for oracle construction. */
  def curwLiterals: Seq[String] =
    (1 to 101).map(d =>
      String.format(java.util.Locale.ROOT, "%.17g", Double.box(Curw(d))))

  def compute(text: String, terms: Array[String]): Double = {
    val raw = text.split(" ")
    // positions per term, 1-based over non-empty tokens
    val pos = Array.fill(terms.length)(
      scala.collection.mutable.ArrayBuffer.empty[Int])
    var idx = 0
    var i = 0
    while (i < raw.length) {
      if (raw(i).nonEmpty) {
        idx += 1
        val low = raw(i).toLowerCase
        var k = 0
        while (k < terms.length) {
          if (low == terms(k)) pos(k) += idx
          k += 1
        }
      }
      i += 1
    }
    if (terms.length < 2) {
      // calc_rank_or, single term, all weights D
      val n = pos(0).length
      if (n == 0) return 0.0
      var resj = 0.0
      var j = 0
      while (j < n) {
        resj = resj + 0.1 / ((j + 1.0) * (j + 1.0))
        j += 1
      }
      // the wjm algebra verbatim (wjm = 0.1, jm = 0): fp op order is
      // part of the spec so the oracle replays it exactly
      (0.1 + resj - 0.1 / 1.0) / 1.64493406685
    } else {
      // calc_rank_and: left fold of (1 − curw) over (i, k, l, p)
      var prod = 1.0
      var any = false
      var ti = 0
      while (ti < terms.length) {
        var tk = 0
        while (tk < ti) {
          val pi = pos(ti)
          val pk = pos(tk)
          var l = 0
          while (l < pi.length) {
            var p = 0
            while (p < pk.length) {
              val dist = math.abs(pi(l) - pk(p))
              if (dist != 0) {
                val curw = Curw(math.min(dist, 101))
                prod = prod * (1.0 - curw)
                any = true
              }
              p += 1
            }
            l += 1
          }
          tk += 1
        }
        ti += 1
      }
      if (!any) 1e-20 else 1.0 - prod
    }
  }
}
