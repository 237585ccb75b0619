package graft.functions

/** SQL renderer for the Porter stemmer — emits the SAME algorithm as
  * [[PorterStemmer]] (shared rule tables) as a chain of plain-SQL
  * stages runnable by an independent engine. This is how the stemmed
  * text-search surface gets a real oracle: DuckDB has no stemmer
  * available offline, so the oracle query *is* Porter, spelled in
  * portable SQL (CASE / substr / right / LIKE / regexp_replace).
  *
  * Key identity making the SQL cheap: the consonant/vowel map is
  * backward-contextual only (y's class depends on the previous letter),
  * so cv(prefix of w) = prefix of cv(w) — each stage computes cv(w)
  * once and every suffix rule's measure test is a LIKE over a substr of
  * it. Measure conditions need no counting: m>0 ⇔ cv LIKE '%V%C%',
  * m>1 ⇔ cv LIKE '%V%C%V%C%' (subsequence match = VC sequence count).
  *
  * Dialect differences are confined to [[Dialect]]: DuckDB's
  * regexp_replace needs the 'g' flag (Spark's replaces all matches by
  * default), and the full-string regex test is RLIKE vs regexp_matches.
  */
object PorterSql {

  sealed trait Dialect {
    def re(s: String, pat: String, rep: String): String
    def isAlpha(c: String): String
  }
  /** Spark SQL spelling (used by the cross-check spec). */
  case object SparkDialect extends Dialect {
    def re(s: String, pat: String, rep: String): String =
      s"regexp_replace($s, '$pat', '$rep')"
    def isAlpha(c: String): String = s"$c RLIKE '^[a-z]+" + "$'"
  }
  /** DuckDB spelling (used by the driver oracle). */
  case object DuckDbDialect extends Dialect {
    def re(s: String, pat: String, rep: String): String =
      s"regexp_replace($s, '$pat', '$rep', 'g')"
    def isAlpha(c: String): String = s"regexp_matches($c, '^[a-z]+" + "$')"
  }

  /** cv map of a lowercased word: vowels→V, consonants→C, with y
    * resolved contextually (y after consonant = vowel, else consonant;
    * two (Vy,Cy) rounds resolve runs of up to three ys — beyond any
    * English word). */
  private def cv(d: Dialect, x: String): String = {
    val r0 = d.re(x, "[aeiou]", "V")
    val r1 = d.re(r0, "[^Vy]", "C")
    val r2 = d.re(r1, "^y", "C")
    val r3 = d.re(r2, "Vy", "VC")
    val r4 = d.re(r3, "Cy", "CV")
    val r5 = d.re(r4, "Vy", "VC")
    val r6 = d.re(r5, "Cy", "CV")
    d.re(r6, "y", "C")
  }

  // snippets over the stage columns w (current word) and cvw (= cv(w))
  private def stemW(k: Int) = s"substr(w, 1, length(w)-$k)"
  private def stemCv(k: Int) = s"substr(cvw, 1, length(w)-$k)"
  private def ends(s: String) = s"right(w, ${s.length}) = '$s'"
  private def mGt0(k: Int) = s"${stemCv(k)} LIKE '%V%C%'"
  private def mGt1(k: Int) = s"${stemCv(k)} LIKE '%V%C%V%C%'"
  private def hasV(k: Int) = s"${stemCv(k)} LIKE '%V%'"

  private val step1a =
    s"""CASE WHEN ${ends("sses")} THEN ${stemW(2)}
       | WHEN ${ends("ies")} THEN ${stemW(2)}
       | WHEN ${ends("ss")} THEN w
       | WHEN ${ends("s")} THEN ${stemW(1)}
       | ELSE w END""".stripMargin

  private val step1b =
    s"""CASE WHEN ${ends("eed")} THEN
       |   CASE WHEN ${mGt0(3)} THEN ${stemW(1)} ELSE w END
       | WHEN ${ends("ed")} AND ${hasV(2)} THEN ${stemW(2)}
       | WHEN ${ends("ing")} AND ${hasV(3)} THEN ${stemW(3)}
       | ELSE w END""".stripMargin

  /** true iff step1b removed -ed/-ing (gates the fixup stage). */
  private val step1bFired =
    s"""CASE WHEN ${ends("eed")} THEN false
       | WHEN ${ends("ed")} AND ${hasV(2)} THEN true
       | WHEN ${ends("ing")} AND ${hasV(3)} THEN true
       | ELSE false END""".stripMargin

  private val fixup =
    s"""CASE WHEN NOT fired THEN w
       | WHEN right(w,2) IN ('at','bl','iz') THEN w || 'e'
       | WHEN length(w) >= 2 AND substr(w, length(w), 1) = substr(w, length(w)-1, 1)
       |      AND right(cvw, 1) = 'C' AND right(w,1) NOT IN ('l','s','z')
       |   THEN ${stemW(1)}
       | WHEN cvw LIKE '%V%C%' AND NOT (cvw LIKE '%V%C%V%C%')
       |      AND right(cvw, 3) = 'CVC' AND right(w,1) NOT IN ('w','x','y')
       |   THEN w || 'e'
       | ELSE w END""".stripMargin

  private val step1c =
    s"""CASE WHEN ${ends("y")} AND ${hasV(1)} THEN ${stemW(1)} || 'i'
       | ELSE w END""".stripMargin

  private def ruleCase(rules: Seq[(String, String)], gt1: Boolean): String = {
    val whens = rules.map { case (suf, rep) =>
      val k = suf.length
      val cond = if (gt1) mGt1(k) else mGt0(k)
      s" WHEN ${ends(suf)} THEN CASE WHEN $cond THEN ${stemW(k)} || '$rep' ELSE w END"
    }
    "CASE" + whens.mkString("\n") + "\n ELSE w END"
  }

  private val step2 = ruleCase(PorterStemmer.Step2.toSeq, gt1 = false)
  private val step3 = ruleCase(PorterStemmer.Step3.toSeq, gt1 = false)

  private val step4 = {
    val whens = PorterStemmer.Step4.toSeq.map { suf =>
      val k = suf.length
      val cond =
        if (suf == "ion")
          s"substr(w, length(w)-$k, 1) IN ('s','t') AND ${mGt1(k)}"
        else mGt1(k)
      s" WHEN ${ends(suf)} THEN CASE WHEN $cond THEN ${stemW(k)} ELSE w END"
    }
    "CASE" + whens.mkString("\n") + "\n ELSE w END"
  }

  private val step5a =
    s"""CASE WHEN ${ends("e")} THEN
       |   CASE WHEN ${mGt1(1)} THEN ${stemW(1)}
       |    WHEN ${mGt0(1)}
       |         AND NOT (right(${stemCv(1)}, 3) = 'CVC'
       |                  AND substr(w, length(w)-1, 1) NOT IN ('w','x','y'))
       |      THEN ${stemW(1)}
       |    ELSE w END
       | ELSE w END""".stripMargin

  private val step5b =
    s"""CASE WHEN cvw LIKE '%V%C%V%C%' AND length(w) >= 2
       |      AND right(w, 2) = 'll' THEN ${stemW(1)}
       | ELSE w END""".stripMargin

  /** Wrap `inner` (a SELECT yielding at least (orig) plus `carry`
    * columns) in the stem stage chain; the result exposes the carry
    * columns plus `stemmed`. Non-alphabetic and length ≤ 2 tokens pass
    * through unchanged (the algorithm's k ≤ 1 guard; digits/CJK route
    * to the `simple`-config behavior, as the reference's parser sends
    * non-words past the snowball dictionary). */
  def stemChain(d: Dialect, inner: String, carry: Seq[String]): String = {
    val cs = (carry :+ "orig").mkString(", ")
    def stage(expr: String) =
      (prev: String) => s"SELECT $cs, ($expr) AS w FROM (\n$prev\n)"
    def withCv(prev: String) =
      s"SELECT $cs, w, (${cv(d, "w")}) AS cvw FROM (\n$prev\n)"

    var q = s"SELECT $cs, orig AS w FROM (\n$inner\n)"
    q = stage(step1a)(q)
    q = withCv(q)
    q = s"SELECT $cs, ($step1b) AS w, ($step1bFired) AS fired FROM (\n$q\n)"
    q = s"SELECT $cs, w, fired, (${cv(d, "w")}) AS cvw FROM (\n$q\n)"
    q = stage(fixup)(q)
    q = withCv(q)
    q = stage(step1c)(q)
    q = withCv(q)
    q = stage(step2)(q)
    q = withCv(q)
    q = stage(step3)(q)
    q = withCv(q)
    q = stage(step4)(q)
    q = withCv(q)
    q = stage(step5a)(q)
    q = withCv(q)
    q = stage(step5b)(q)
    s"""SELECT $cs,
       | CASE WHEN length(orig) > 2 AND ${d.isAlpha("orig")} THEN w
       |      ELSE orig END AS stemmed
       |FROM (
       |$q
       |)""".stripMargin
  }
}
