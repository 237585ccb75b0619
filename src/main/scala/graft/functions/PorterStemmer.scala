package graft.functions

/** The Porter stemming algorithm (M.F. Porter, "An algorithm for suffix
  * stripping", Program 14(3) 1980) — the `english` snowball dictionary
  * the reference loads for to_tsvector('english', ...) (reference:
  * src/backend/snowball/dict_snowball.c, src/backend/tsearch/ts_parse.c).
  *
  * This is a from-scratch implementation of the published algorithm,
  * including the two departures in the author's official reference
  * implementation (step 2: BLI→BLE, LOGI→LOG). It is pure and
  * deterministic — the same word always maps to the same stem on any
  * executor — so stemmed tsvectors are reproducible at any parallelism.
  *
  * Words of length ≤ 2 are returned unchanged (the algorithm's k ≤ 1
  * guard). Input is assumed lowercased by the tokenizer.
  */
object PorterStemmer {

  /** True when w(i) is a consonant: not a/e/i/o/u; 'y' is a consonant
    * at position 0 or after a vowel (i.e. vowel when after a consonant). */
  private def cons(w: CharSequence, i: Int): Boolean = w.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y' => if (i == 0) true else !cons(w, i - 1)
    case _ => true
  }

  /** m of w[0, end): the number of VC sequences in [C](VC)^m[V]. */
  private def measure(w: CharSequence, end: Int): Int = {
    var n = 0
    var i = 0
    while (i < end && cons(w, i)) i += 1
    while (i < end) {
      while (i < end && !cons(w, i)) i += 1
      if (i < end) {
        n += 1
        while (i < end && cons(w, i)) i += 1
      }
    }
    n
  }

  private def hasVowel(w: CharSequence, end: Int): Boolean = {
    var i = 0
    while (i < end) {
      if (!cons(w, i)) return true
      i += 1
    }
    false
  }

  /** *d — w[0,end) ends with a double consonant. */
  private def dblC(w: CharSequence, end: Int): Boolean =
    end >= 2 && w.charAt(end - 1) == w.charAt(end - 2) && cons(w, end - 1)

  /** *o — w[0,end) ends consonant-vowel-consonant, last not w/x/y. */
  private def cvcEnd(w: CharSequence, end: Int): Boolean =
    end >= 3 && cons(w, end - 3) && !cons(w, end - 2) && cons(w, end - 1) && {
      val c = w.charAt(end - 1)
      c != 'w' && c != 'x' && c != 'y'
    }

  private def ends(w: String, s: String): Boolean = w.endsWith(s)
  private def chop(w: String, n: Int): String = w.substring(0, w.length - n)

  private def step1a(w: String): String =
    if (ends(w, "sses")) chop(w, 2)
    else if (ends(w, "ies")) chop(w, 2)
    else if (ends(w, "ss")) w
    else if (ends(w, "s")) chop(w, 1)
    else w

  private def step1b(w: String): String =
    if (ends(w, "eed")) {
      if (measure(w, w.length - 3) > 0) chop(w, 1) else w
    } else if (ends(w, "ed")) {
      if (hasVowel(w, w.length - 2)) fixup(chop(w, 2)) else w
    } else if (ends(w, "ing")) {
      if (hasVowel(w, w.length - 3)) fixup(chop(w, 3)) else w
    } else w

  /** Applied only when step 1b removed -ed/-ing. */
  private def fixup(w: String): String =
    if (ends(w, "at") || ends(w, "bl") || ends(w, "iz")) w + "e"
    else if (dblC(w, w.length) && !"lsz".contains(w.charAt(w.length - 1)))
      chop(w, 1)
    else if (measure(w, w.length) == 1 && cvcEnd(w, w.length)) w + "e"
    else w

  private def step1c(w: String): String =
    if (ends(w, "y") && hasVowel(w, w.length - 1)) chop(w, 1) + "i" else w

  /** (suffix, replacement) rule lists; within each step the FIRST
    * matching suffix selects the rule, then the measure condition gates
    * the replacement — a failed condition stops the step (Porter's
    * longest-match-then-test semantics, same order as the official
    * reference implementation's per-letter switch). */
  private[graft] val Step2: Array[(String, String)] = Array(
    "ational" -> "ate", "tional" -> "tion", "enci" -> "ence",
    "anci" -> "ance", "izer" -> "ize", "bli" -> "ble", "alli" -> "al",
    "entli" -> "ent", "eli" -> "e", "ousli" -> "ous", "ization" -> "ize",
    "ation" -> "ate", "ator" -> "ate", "alism" -> "al", "iveness" -> "ive",
    "fulness" -> "ful", "ousness" -> "ous", "aliti" -> "al",
    "iviti" -> "ive", "biliti" -> "ble", "logi" -> "log")

  private[graft] val Step3: Array[(String, String)] = Array(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")

  private[graft] val Step4: Array[String] = Array(
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize")

  private def applyRules(
      w: String, rules: Array[(String, String)], minM: Int): String = {
    var i = 0
    while (i < rules.length) {
      val (suf, rep) = rules(i)
      if (ends(w, suf)) {
        val stemEnd = w.length - suf.length
        return if (measure(w, stemEnd) > minM) w.substring(0, stemEnd) + rep
        else w
      }
      i += 1
    }
    w
  }

  private def step4(w: String): String = {
    var i = 0
    while (i < Step4.length) {
      val suf = Step4(i)
      if (ends(w, suf)) {
        val stemEnd = w.length - suf.length
        val extra = suf != "ion" || (stemEnd >= 1 &&
          (w.charAt(stemEnd - 1) == 's' || w.charAt(stemEnd - 1) == 't'))
        return if (extra && measure(w, stemEnd) > 1) w.substring(0, stemEnd)
        else w
      }
      i += 1
    }
    w
  }

  private def step5a(w: String): String =
    if (ends(w, "e")) {
      val stemEnd = w.length - 1
      val m = measure(w, stemEnd)
      if (m > 1 || (m == 1 && !cvcEnd(w, stemEnd))) chop(w, 1) else w
    } else w

  private def step5b(w: String): String =
    if (measure(w, w.length) > 1 && dblC(w, w.length) &&
      w.charAt(w.length - 1) == 'l') chop(w, 1)
    else w

  /** Stem a single lowercased word. */
  def stem(word: String): String = {
    if (word.length <= 2) return word
    var w = word
    w = step1a(w)
    w = step1b(w)
    w = step1c(w)
    w = applyRules(w, Step2, 0)
    w = applyRules(w, Step3, 0)
    w = step4(w)
    w = step5a(w)
    w = step5b(w)
    w
  }

  /** The snowball `english` stopword list the reference's english text
    * search configuration drops before stemming
    * (src/backend/snowball/stopwords/english.stop). */
  val EnglishStopwords: Set[String] = Set(
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves", "you",
    "your", "yours", "yourself", "yourselves", "he", "him", "his",
    "himself", "she", "her", "hers", "herself", "it", "its", "itself",
    "they", "them", "their", "theirs", "themselves", "what", "which",
    "who", "whom", "this", "that", "these", "those", "am", "is", "are",
    "was", "were", "be", "been", "being", "have", "has", "had", "having",
    "do", "does", "did", "doing", "a", "an", "the", "and", "but", "if",
    "or", "because", "as", "until", "while", "of", "at", "by", "for",
    "with", "about", "against", "between", "into", "through", "during",
    "before", "after", "above", "below", "to", "from", "up", "down",
    "in", "out", "on", "off", "over", "under", "again", "further",
    "then", "once", "here", "there", "when", "where", "why", "how",
    "all", "any", "both", "each", "few", "more", "most", "other",
    "some", "such", "no", "nor", "not", "only", "own", "same", "so",
    "than", "too", "very", "s", "t", "can", "will", "just", "don",
    "should", "now")
}
