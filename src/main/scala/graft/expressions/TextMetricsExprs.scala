package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass text-metric expressions (the TokenEntropyExpr
  * pattern): each replaces a family of per-metric `regexp_count`
  * alternation passes with a single character scan, keeping a 100 TB
  * quality sweep's per-row constant at "read the string once".
  *
  * Exactness contract (both expressions): results are bit-identical to
  * the declarative formulations they replaced —
  *   - counts mirror java-regex `\s` / `\S+` semantics (ASCII
  *     whitespace) and Spark `length()` (code points);
  *   - token membership mirrors `lower(trim(text))` + whole-token
  *     regex alternation: ASCII tokens are ascii-lowered inline, tokens
  *     with any non-ASCII char fall back to `String.toLowerCase` (the
  *     same call `UTF8String.toLowerCase` makes for non-ASCII strings,
  *     so exotic mappings like U+017F ſ→s agree);
  *   - all double arithmetic reproduces the original expression tree's
  *     association order, so downstream `round(_, 6)` sees the same
  *     bits at any parallelism.
  */
object TextMetrics {

  /** Word set packed as sorted longs: ascii-lowered chars (≤5) in the
    * low 40 bits, length in bits 40+. Zero-allocation membership for
    * the fast path; 20–40 entries ⇒ binary search is ~5 compares. */
  private[expressions] def packKey(s: CharSequence, start: Int, len: Int): Long = {
    var key = len.toLong << 40
    var i = 0
    while (i < len) {
      var c = s.charAt(start + i)
      if (c >= 'A' && c <= 'Z') c = (c + 32).toChar
      if (c >= 128) return -1L // non-ASCII: caller takes the slow path
      key |= c.toLong << (i * 8)
      i += 1
    }
    key
  }

  /** Is `c` a java-regex `\s` char (ASCII whitespace)? */
  @inline private[expressions] def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
}

/** text_quality(text) → struct(punct_ratio, digit_ratio, avg_word_len,
  * stopword_ratio, quality) — every q_text_quality metric in one scan.
  * Raw (unrounded) doubles; callers apply `round(_, 6)` exactly like
  * the formulation this replaces, so rounded outputs are identical. */
case class TextQualityExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"text_quality requires STRING input, got ${child.dataType.sql}")

  override def dataType: DataType = StructType(Seq(
    StructField("punct_ratio", DoubleType, nullable = false),
    StructField("digit_ratio", DoubleType, nullable = false),
    StructField("avg_word_len", DoubleType, nullable = false),
    StructField("stopword_ratio", DoubleType, nullable = false),
    StructField("quality", DoubleType, nullable = false)))

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "text_quality"

  protected override def nullSafeEval(input: Any): Any =
    TextQualityExpr.compute(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.TextQualityExpr.compute($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): TextQualityExpr =
    copy(child = newChild)
}

object TextQualityExpr {
  import TextMetrics._

  /** graft.operators.TextAnalysis.EnStopwords, packed + sorted (all
    * ASCII, max length 4). */
  private val StopKeys: Array[Long] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "this", "be", "are")
    .map(w => packKey(w, 0, w.length)).sorted.toArray
  private val MaxStopLen = 4

  // punct set of TextAnalysis.punctRatio: . , ; : ! ? ' " ( ) -
  private val Punct: Array[Boolean] = {
    val a = new Array[Boolean](128)
    ".,;:!?'\"()-".foreach(c => a(c) = true)
    a
  }

  def compute(text: String): InternalRow = {
    val n = text.length
    var cp = 0      // code points == Spark length(text)
    var punct = 0   // punct code points
    var digit = 0   // digit code points
    var ws = 0      // java-regex \s code points
    var nTok = 0    // \S+ runs == TextAnalysis.tokenCount
    var hits = 0    // tokens in the stopword set (lowered)
    var tokStart = -1
    var tokAscii = true
    var i = 0
    while (i <= n) {
      val c = if (i < n) text.charAt(i) else ' ' // virtual trailing ws closes the last token
      val w = isWs(c)
      if (i < n) {
        if (!Character.isLowSurrogate(c)) cp += 1
        if (w) ws += 1
        else if (c < 128) {
          if (Punct(c)) punct += 1
          else if (c >= '0' && c <= '9') digit += 1
        }
      }
      if (w) {
        if (tokStart >= 0) {
          nTok += 1
          val len = i - tokStart
          if (tokAscii) {
            if (len <= MaxStopLen &&
              java.util.Arrays.binarySearch(StopKeys, packKey(text, tokStart, len)) >= 0)
              hits += 1
          } else {
            val lo = text.substring(tokStart, i).toLowerCase
            if (lo.length <= MaxStopLen) {
              val k = packKey(lo, 0, lo.length)
              if (k >= 0 && java.util.Arrays.binarySearch(StopKeys, k) >= 0) hits += 1
            }
          }
          tokStart = -1
          tokAscii = true
        }
      } else {
        if (tokStart < 0) tokStart = i
        if (c >= 128) tokAscii = false
      }
      i += 1
    }
    val lenD = cp.toDouble
    val punctR = if (cp == 0) 0.0 else punct.toDouble / lenD
    val digitR = if (cp == 0) 0.0 else digit.toDouble / lenD
    val nD = nTok.toDouble
    val awl = if (nTok == 0) 0.0 else (cp - ws).toDouble / nD
    val swr = if (nTok == 0) 0.0 else hits.toDouble / nD
    // association order mirrors the original Column tree exactly
    val lenScore = { val x = lenD / 200.0; if (x < 1.0) x else 1.0 }
    val punctPen = { val x = punctR * 5.0; if (x < 1.0) x else 1.0 }
    val digitPen = { val x = digitR * 5.0; if (x < 1.0) x else 1.0 }
    val wordScore = if (awl >= 3.0 && awl <= 8.0) 1.0 else 0.5
    val quality = lenScore * 0.4 + (1.0 - punctPen) * 0.2 +
      (1.0 - digitPen) * 0.2 + wordScore * 0.2
    new GenericInternalRow(Array[Any](punctR, digitR, awl, swr, quality))
  }

  /** Column form; resolves through the function registry. */
  def textQuality(c: Column): Column =
    org.apache.spark.sql.functions.call_function("text_quality", c)
}

/** lang_id(text) → string — the TextAnalysis.langId heuristic (CJK
  * codepoint test, else argmax of marker-word counts with tie order
  * en>de>es>fr, 'und' when nothing scores) in one scan. */
case class LangIdExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lang_id requires STRING input, got ${child.dataType.sql}")

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lang_id"

  protected override def nullSafeEval(input: Any): Any =
    LangIdExpr.compute(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.LangIdExpr.compute($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}

object LangIdExpr {
  import TextMetrics._

  /** graft.operators.TextAnalysis.LangMarkers flattened to
    * (packed key → language bitmask en=1 de=2 es=4 fr=8); shared words
    * ("la", "un", "que", …) carry a merged mask. Max length 5. */
  private val (markerKeys: Array[Long], markerMasks: Array[Int]) = {
    val markers: Seq[(Int, Seq[String])] = Seq(
      1 -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "with", "for"),
      2 -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "auf"),
      4 -> Seq("el", "la", "los", "las", "es", "un", "una", "que", "por", "para"),
      8 -> Seq("le", "la", "les", "et", "est", "un", "une", "que", "pour", "dans"))
    val merged = scala.collection.mutable.Map.empty[Long, Int]
    for ((mask, words) <- markers; w <- words)
      merged.updateWith(packKey(w, 0, w.length)) {
        case Some(m) => Some(m | mask); case None => Some(mask)
      }
    val sorted = merged.toArray.sortBy(_._1)
    (sorted.map(_._1), sorted.map(_._2))
  }
  private val MaxMarkerLen = 5

  private val ZH = UTF8String.fromString("zh")
  private val UND = UTF8String.fromString("und")
  private val EN = UTF8String.fromString("en")
  private val DE = UTF8String.fromString("de")
  private val ES = UTF8String.fromString("es")
  private val FR = UTF8String.fromString("fr")

  def compute(text: String): UTF8String = {
    val n = text.length
    var zh = false
    var en = 0; var de = 0; var es = 0; var fr = 0
    var tokStart = -1
    var tokAscii = true
    var i = 0
    @inline def score(key: Long): Unit = {
      val idx = java.util.Arrays.binarySearch(markerKeys, key)
      if (idx >= 0) {
        val m = markerMasks(idx)
        if ((m & 1) != 0) en += 1
        if ((m & 2) != 0) de += 1
        if ((m & 4) != 0) es += 1
        if ((m & 8) != 0) fr += 1
      }
    }
    while (i <= n) {
      val c = if (i < n) text.charAt(i) else ' '
      if (c >= 0x4e00 && c <= 0x9fff) zh = true
      if (isWs(c)) {
        if (tokStart >= 0) {
          val len = i - tokStart
          if (tokAscii) {
            if (len <= MaxMarkerLen) score(packKey(text, tokStart, len))
          } else {
            val lo = text.substring(tokStart, i).toLowerCase
            if (lo.length <= MaxMarkerLen) {
              val k = packKey(lo, 0, lo.length)
              if (k >= 0) score(k)
            }
          }
          tokStart = -1
          tokAscii = true
        }
      } else {
        if (tokStart < 0) tokStart = i
        if (c >= 128) tokAscii = false
      }
      i += 1
    }
    if (zh) ZH
    else if (en == 0 && de == 0 && es == 0 && fr == 0) UND
    else if (en >= de && en >= es && en >= fr) EN
    else if (de >= es && de >= fr) DE
    else if (es >= fr) ES
    else FR
  }

  /** Column form; resolves through the function registry. */
  def langId(c: Column): Column =
    org.apache.spark.sql.functions.call_function("lang_id", c)
}
