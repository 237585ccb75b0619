package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Lower}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Engine extension registration (SURVEY §4.2: the only Catalyst
  * extension points graft needs — SQL-callable custom expressions and a
  * small optimizer rule; everything else is built-in machinery). Session
  * wiring: `GraftSession.builder` applies `.withExtensions(new
  * GraftExtensions)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("simhash32"),
      new ExpressionInfo(classOf[SimHash32Expr].getName, "simhash32"),
      (exprs: Seq[Expression]) => SimHash32Expr(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("dotf"),
      new ExpressionInfo(classOf[DotFExpr].getName, "dotf"),
      (exprs: Seq[Expression]) => DotFExpr(exprs(0), exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("lsh_bucket"),
      new ExpressionInfo(classOf[LshBucketExpr].getName, "lsh_bucket"),
      (exprs: Seq[Expression]) => LshBucketExpr(exprs(0), exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("arr_eq_count"),
      new ExpressionInfo(classOf[ArrEqCountExpr].getName, "arr_eq_count"),
      (exprs: Seq[Expression]) => ArrEqCountExpr(exprs(0), exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("token_entropy"),
      new ExpressionInfo(classOf[TokenEntropyExpr].getName, "token_entropy"),
      (exprs: Seq[Expression]) => TokenEntropyExpr(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("text_quality"),
      new ExpressionInfo(classOf[TextQualityExpr].getName, "text_quality"),
      (exprs: Seq[Expression]) => TextQualityExpr(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("lang_id"),
      new ExpressionInfo(classOf[LangIdExpr].getName, "lang_id"),
      (exprs: Seq[Expression]) => LangIdExpr(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("porter_stem"),
      new ExpressionInfo(classOf[PorterStemExpr].getName, "porter_stem"),
      (exprs: Seq[Expression]) => PorterStemExpr(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("metaphone"),
      new ExpressionInfo(classOf[MetaphoneExpr].getName, "metaphone"),
      (exprs: Seq[Expression]) => MetaphoneExpr(exprs(0), exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("ts_headline"),
      new ExpressionInfo(classOf[TsHeadlineExpr].getName, "ts_headline"),
      (exprs: Seq[Expression]) => {
        // PG surface: ts_headline(document, query [, options]) — the
        // query is a LITERAL of space-separated AND terms
        // (plainto_tsquery), options the PG 'k=v, …' literal string
        def lit(e: Expression, what: String): String = e match {
          case org.apache.spark.sql.catalyst.expressions
            .Literal(s: org.apache.spark.unsafe.types.UTF8String, _) =>
            s.toString
          case _ => throw new IllegalArgumentException(
            s"ts_headline $what must be a string literal")
        }
        if (exprs.size < 2) throw new IllegalArgumentException(
          "ts_headline(document, query[, options]) needs 2+ args")
        // dedupe: plainto_tsquery('hash hash') is one lexeme — a
        // duplicate term would otherwise hold a cover slot that never
        // fills (first-match indexing) and every doc would yield NULL
        val terms = lit(exprs(1), "query").toLowerCase
          .split("\\s+").filter(_.nonEmpty).distinct.toSeq
        val opts = exprs.drop(2).headOption
          .map(o => lit(o, "options").split(",").flatMap { kv =>
            kv.split("=", 2) match {
              case Array(k, v) => Some(k.trim.toLowerCase -> v.trim)
              case _ => None
            }
          }.toMap).getOrElse(Map.empty[String, String])
        TsHeadlineExpr(exprs.head, terms,
          opts.get("maxwords").map(_.toInt).getOrElse(35),
          opts.getOrElse("startsel", "<b>"),
          opts.getOrElse("stopsel", "</b>"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("ts_rank"),
      new ExpressionInfo(classOf[TsRankExpr].getName, "ts_rank"),
      (exprs: Seq[Expression]) => {
        if (exprs.size < 2) throw new IllegalArgumentException(
          "ts_rank(document, query) needs 2 args")
        val q = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions
            .Literal(s: org.apache.spark.unsafe.types.UTF8String, _) =>
            s.toString
          case _ => throw new IllegalArgumentException(
            "ts_rank query must be a string literal")
        }
        TsRankExpr(exprs.head,
          q.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq)
      }))
    ext.injectFunction((
      new FunctionIdentifier("ts_rank_cd"),
      new ExpressionInfo(classOf[TsRankCdExpr].getName, "ts_rank_cd"),
      (exprs: Seq[Expression]) => {
        // PG surface: ts_rank_cd(document, query) — query a LITERAL of
        // space-separated AND terms (plainto_tsquery, deduped)
        if (exprs.size < 2) throw new IllegalArgumentException(
          "ts_rank_cd(document, query) needs 2 args")
        val q = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions
            .Literal(s: org.apache.spark.unsafe.types.UTF8String, _) =>
            s.toString
          case _ => throw new IllegalArgumentException(
            "ts_rank_cd query must be a string literal")
        }
        TsRankCdExpr(exprs.head,
          q.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct.toSeq)
      }))
    ext.injectFunction((
      new FunctionIdentifier("xml_is_well_formed"),
      new ExpressionInfo(classOf[XmlWellFormedExpr].getName,
        "xml_is_well_formed"),
      // default xmloption = content (xml.c)
      (exprs: Seq[Expression]) => XmlWellFormedExpr(exprs.head, doc = false)))
    ext.injectFunction((
      new FunctionIdentifier("xml_is_well_formed_document"),
      new ExpressionInfo(classOf[XmlWellFormedExpr].getName,
        "xml_is_well_formed_document"),
      (exprs: Seq[Expression]) => XmlWellFormedExpr(exprs.head, doc = true)))
    ext.injectFunction((
      new FunctionIdentifier("xml_is_well_formed_content"),
      new ExpressionInfo(classOf[XmlWellFormedExpr].getName,
        "xml_is_well_formed_content"),
      (exprs: Seq[Expression]) => XmlWellFormedExpr(exprs.head, doc = false)))
    ext.injectFunction((
      new FunctionIdentifier("pii_scan"),
      new ExpressionInfo(classOf[PiiScanExpr].getName, "pii_scan"),
      (exprs: Seq[Expression]) => PiiScanExpr(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("svec_dot"),
      new ExpressionInfo(classOf[SvecDotExpr].getName, "svec_dot"),
      (exprs: Seq[Expression]) =>
        SvecDotExpr(exprs(0), exprs(1), exprs(2), exprs(3))))
    ext.injectOptimizerRule(_ => SimplifyRedundantLowerUnderSimhash)
    // ANALYZE → planner bridge: attach collected stats to parquet scans
    // ahead of Catalyst's Join Reorder batch (costsize.c analogue).
    ext.injectOptimizerRule(_ => graft.plans.InjectAnalyzedStats)
  }
}

/** simhash32 lowercases internally — `simhash32(lower(x))` re-scans the
  * string for nothing. Remove the inner Lower (idempotent; converges). */
object SimplifyRedundantLowerUnderSimhash extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case SimHash32Expr(Lower(inner)) => SimHash32Expr(inner)
    }
}
