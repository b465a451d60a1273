package graft.functions

/** The Porter stemming algorithm (M.F. Porter, "An algorithm for suffix
  * stripping", Program 14(3), 1980) — implemented from the paper's
  * published rule tables, WITHOUT the later Snowball-era departures
  * (no LOGI→LOG, no special-casing of -abli beyond the paper): the
  * normalization leg of corpus token analytics (stem-grain vocabulary
  * stats, query/document term matching) next to the subword tokenizers
  * (Bpe/UnigramLm/WordPiece, which learn their units; Porter fixes them
  * by rule).
  *
  * Structure per the paper: a word is [C](VC)^m[V]; `y` is a consonant
  * only where not preceded by one; each step applies its LONGEST
  * matching suffix rule and, if that rule's m-condition fails, the step
  * ends (it does NOT fall through to shorter suffixes — "feed" survives
  * 1b untouched because EED matched with m=0).
  *
  * Deterministic pure string scanning — no regexes, no locale (ASCII
  * lowercase fold) — so stems replay identically on any engine; the
  * gate query `docs_porter_stems` drives 20 vectors spanning every step
  * through the driver oracle and `PorterStemmerSpec` pins a wider set. */
object PorterStemmer {

  def stem(word: String): String = {
    if (word == null) return null
    val w = word.toLowerCase
    if (w.length <= 2) w
    else step5b(step5a(step4(step3(step2(step1c(step1b(step1a(w))))))))
  }

  private def isCons(w: String, i: Int): Boolean = w.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y' => i == 0 || !isCons(w, i - 1)
    case _ => true
  }

  /** m of [C](VC)^m[V]: the number of vowel→consonant transitions. */
  private def measure(w: String): Int = {
    var m = 0
    var i = 0
    val n = w.length
    while (i < n && isCons(w, i)) i += 1
    while (i < n) {
      while (i < n && !isCons(w, i)) i += 1
      if (i < n) {
        m += 1
        while (i < n && isCons(w, i)) i += 1
      }
    }
    m
  }

  private def hasVowel(w: String): Boolean =
    (0 until w.length).exists(i => !isCons(w, i))

  private def doubleCons(w: String): Boolean = {
    val n = w.length
    n >= 2 && w.charAt(n - 1) == w.charAt(n - 2) && isCons(w, n - 1)
  }

  /** *o: ends CVC where the final consonant is not w, x or y. */
  private def cvc(w: String): Boolean = {
    val n = w.length
    n >= 3 && isCons(w, n - 3) && !isCons(w, n - 2) && isCons(w, n - 1) &&
      "wxy".indexOf(w.charAt(n - 1)) < 0
  }

  private def step1a(w: String): String =
    if (w.endsWith("sses")) w.dropRight(2)
    else if (w.endsWith("ies")) w.dropRight(2)
    else if (w.endsWith("ss")) w
    else if (w.endsWith("s")) w.dropRight(1)
    else w

  private def step1b(w: String): String =
    if (w.endsWith("eed")) {
      if (measure(w.dropRight(3)) > 0) w.dropRight(1) else w
    } else if (w.endsWith("ed") && hasVowel(w.dropRight(2)))
      cleanup1b(w.dropRight(2))
    else if (w.endsWith("ing") && hasVowel(w.dropRight(3)))
      cleanup1b(w.dropRight(3))
    else w

  /** The post-ED/ING repair: AT/BL/IZ regain an E, a non-L/S/Z double
    * consonant single-letters, and a short (m=1, *o) stem regains an E. */
  private def cleanup1b(w: String): String =
    if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w + "e"
    else if (doubleCons(w) && "lsz".indexOf(w.charAt(w.length - 1)) < 0)
      w.dropRight(1)
    else if (measure(w) == 1 && cvc(w)) w + "e"
    else w

  private def step1c(w: String): String =
    if (w.endsWith("y") && hasVowel(w.dropRight(1))) w.dropRight(1) + "i"
    else w

  private val Step2 = List(
    "ational" -> "ate", "tional" -> "tion", "enci" -> "ence",
    "anci" -> "ance", "izer" -> "ize", "abli" -> "able", "alli" -> "al",
    "entli" -> "ent", "eli" -> "e", "ousli" -> "ous", "ization" -> "ize",
    "ation" -> "ate", "ator" -> "ate", "alism" -> "al",
    "iveness" -> "ive", "fulness" -> "ful", "ousness" -> "ous",
    "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")

  private val Step3 = List(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")

  private val Step4 = List(
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize")

  /** Longest matching suffix; its condition decides the WHOLE step. */
  private def replaceLongest(w: String, rules: List[(String, String)],
      minMeasure: Int): String = {
    val applicable = rules.filter { case (suf, _) => w.endsWith(suf) }
    if (applicable.isEmpty) w
    else {
      val (suf, rep) = applicable.maxBy(_._1.length)
      val st = w.dropRight(suf.length)
      if (measure(st) >= minMeasure) st + rep else w
    }
  }

  private def step2(w: String): String = replaceLongest(w, Step2, 1)

  private def step3(w: String): String = replaceLongest(w, Step3, 1)

  private def step4(w: String): String = {
    val applicable = Step4.filter(w.endsWith)
    if (applicable.isEmpty) w
    else {
      val suf = applicable.maxBy(_.length)
      val st = w.dropRight(suf.length)
      val ok = measure(st) > 1 &&
        (suf != "ion" || st.endsWith("s") || st.endsWith("t"))
      if (ok) st else w
    }
  }

  private def step5a(w: String): String =
    if (w.endsWith("e")) {
      val st = w.dropRight(1)
      val m = measure(st)
      if (m > 1 || (m == 1 && !cvc(st))) st else w
    } else w

  private def step5b(w: String): String =
    if (w.endsWith("ll") && measure(w) > 1) w.dropRight(1) else w
}
