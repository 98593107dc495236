package graft.text

/** Porter stemming algorithm (Porter 1980, public domain algorithm) —
  * minimal dependency-free English stemmer standing in for the
  * reference's Snowball stemmer (reference: src/main/scala/ws/vinta/
  * albedo/transformers/SnowballStemmer.scala:9-41; the snowball jar is
  * unavailable offline, documented delta: classic Porter, not Porter2).
  */
object PorterStemmer {

  def stem(word: String): String = {
    if (word == null || word.length <= 2) return word
    if (!word.forall(c => c >= 'a' && c <= 'z')) return word
    var w = word
    w = step1a(w); w = step1b(w); w = step1c(w)
    w = step2(w); w = step3(w); w = step4(w); w = step5(w)
    w
  }

  private def isCons(w: String, i: Int): Boolean = w(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y' => i == 0 || !isCons(w, i - 1)
    case _ => true
  }

  /** measure: number of VC sequences in the stem. */
  private def m(w: String): Int = {
    var n = 0; var i = 0
    val len = w.length
    while (i < len && isCons(w, i)) i += 1
    while (i < len) {
      while (i < len && !isCons(w, i)) i += 1
      if (i < len) { n += 1; while (i < len && isCons(w, i)) i += 1 }
    }
    n
  }

  private def containsVowel(w: String): Boolean =
    w.indices.exists(i => !isCons(w, i))

  private def endsDoubleCons(w: String): Boolean =
    w.length >= 2 && w(w.length - 1) == w(w.length - 2) && isCons(w, w.length - 1)

  /** *o: cvc where final c is not w, x or y. */
  private def cvc(w: String): Boolean =
    w.length >= 3 && isCons(w, w.length - 3) && !isCons(w, w.length - 2) &&
      isCons(w, w.length - 1) && !"wxy".contains(w(w.length - 1))

  private def repl(w: String, suf: String, rep: String, minM: Int): Option[String] =
    if (w.endsWith(suf)) {
      val stem = w.dropRight(suf.length)
      if (m(stem) > minM) Some(stem + rep) else None
    } else None

  private def step1a(w: String): String =
    if (w.endsWith("sses")) w.dropRight(2)
    else if (w.endsWith("ies")) w.dropRight(2)
    else if (w.endsWith("ss")) w
    else if (w.endsWith("s")) w.dropRight(1)
    else w

  private def step1b(w: String): String = {
    if (w.endsWith("eed")) {
      if (m(w.dropRight(3)) > 0) w.dropRight(1) else w
    } else {
      val stripped =
        if (w.endsWith("ed") && containsVowel(w.dropRight(2))) Some(w.dropRight(2))
        else if (w.endsWith("ing") && containsVowel(w.dropRight(3))) Some(w.dropRight(3))
        else None
      stripped match {
        case Some(s) =>
          if (s.endsWith("at") || s.endsWith("bl") || s.endsWith("iz")) s + "e"
          else if (endsDoubleCons(s) && !"lsz".contains(s.last)) s.dropRight(1)
          else if (m(s) == 1 && cvc(s)) s + "e"
          else s
        case None => w
      }
    }
  }

  private def step1c(w: String): String =
    if (w.endsWith("y") && containsVowel(w.dropRight(1))) w.dropRight(1) + "i" else w

  private val step2Rules = Seq(
    "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
    "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
    "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
    "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
    "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")

  private def step2(w: String): String =
    step2Rules.collectFirst {
      case (s, r) if w.endsWith(s) && m(w.dropRight(s.length)) > 0 =>
        w.dropRight(s.length) + r
    }.getOrElse(w)

  private val step3Rules = Seq(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")

  private def step3(w: String): String =
    step3Rules.collectFirst {
      case (s, r) if w.endsWith(s) && m(w.dropRight(s.length)) > 0 =>
        w.dropRight(s.length) + r
    }.getOrElse(w)

  private val step4Sufs = Seq(
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize")

  private def step4(w: String): String = {
    // special case: (m>1) (*S or *T) ion → delete "ion"
    if (w.endsWith("ion") && w.length > 3 &&
        "st".contains(w(w.length - 4)) && m(w.dropRight(3)) > 1)
      return w.dropRight(3)
    step4Sufs.collectFirst {
      case s if w.endsWith(s) && m(w.dropRight(s.length)) > 1 =>
        w.dropRight(s.length)
    }.getOrElse(w)
  }

  private def step5(w: String): String = {
    var v = w
    if (v.endsWith("e")) {
      val stem = v.dropRight(1)
      if (m(stem) > 1 || (m(stem) == 1 && !cvc(stem))) v = stem
    }
    if (v.endsWith("ll") && m(v) > 1) v = v.dropRight(1)
    v
  }
}
