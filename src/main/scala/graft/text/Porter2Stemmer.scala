package graft.text

/** Porter2 ("Snowball English") stemmer, implemented from the
  * published algorithm description (M.F. Porter, snowballstem.org
  * English stemmer definition — public spec; also Porter 2001, "The
  * English (Porter2) stemming algorithm").
  *
  * This is the algorithm behind the reference's
  * `org.tartarus.snowball.ext.EnglishStemmer`
  * (reference: src/main/scala/ws/vinta/albedo/transformers/
  * SnowballStemmer.scala:7,18 — the Snowball jar itself is unavailable
  * offline, so the algorithm is re-implemented from its spec). This
  * closes the r1/r2 "classic Porter, not Porter2" documented delta.
  *
  * Pure function on lowercase tokens; non-alphabetic tokens and tokens
  * shorter than 3 chars pass through unchanged (the reference wraps
  * stemming in try/catch and keeps the input on failure — same
  * contract).
  */
object Porter2Stemmer {

  private val exceptions1 = Map(
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl",
    "sky" -> "sky", "news" -> "news", "howe" -> "howe", "atlas" -> "atlas",
    "cosmos" -> "cosmos", "bias" -> "bias", "andes" -> "andes")

  private val exceptions2 = Set(
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed")

  private val doubles = Set("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
  private val validLi = "cdeghkmnrt".toSet

  def stem(word: String): String = {
    if (word == null || word.length < 3) return word
    if (!word.forall(c => (c >= 'a' && c <= 'z') || c == '\'')) return word
    exceptions1.get(word) match {
      case Some(s) => return s
      case None =>
    }

    // prelude: strip leading apostrophe; mark consonant-y as 'Y'
    var w = if (word.startsWith("'")) word.substring(1) else word
    if (w.length < 3) return w
    val sb = new StringBuilder(w)
    if (sb.charAt(0) == 'y') sb.setCharAt(0, 'Y')
    var i = 1
    while (i < sb.length) {
      if (sb.charAt(i) == 'y' && isVowel(sb.charAt(i - 1))) sb.setCharAt(i, 'Y')
      i += 1
    }
    w = sb.toString

    w = step0(w)
    w = step1a(w)
    if (exceptions2.contains(w)) return w.replace('Y', 'y')
    w = step1b(w)
    w = step1c(w)
    w = step2(w)
    w = step3(w)
    w = step4(w)
    w = step5(w)
    w.replace('Y', 'y')
  }

  private def isVowel(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y'

  /** R1 start index: after the first non-vowel following a vowel —
    * with the gener-/commun-/arsen- prefix exception. */
  private def r1(w: String): Int = {
    for (p <- Seq("gener", "commun", "arsen"))
      if (w.startsWith(p)) return p.length
    regionAfterVC(w, 0)
  }

  private def r2(w: String): Int = regionAfterVC(w, r1(w))

  private def regionAfterVC(w: String, from: Int): Int = {
    var i = from
    while (i < w.length && !isVowel(w.charAt(i))) i += 1
    while (i < w.length && isVowel(w.charAt(i))) i += 1
    if (i < w.length) i + 1 else w.length
  }

  /** Short syllable ending at position `end` (exclusive). */
  private def endsInShortSyllable(w: String): Boolean = {
    val n = w.length
    if (n >= 3) {
      val c = w.charAt(n - 1); val v = w.charAt(n - 2); val p = w.charAt(n - 3)
      if (!isVowel(c) && c != 'w' && c != 'x' && c != 'Y' &&
        isVowel(v) && !isVowel(p)) return true
    }
    if (n == 2 && isVowel(w.charAt(0)) && !isVowel(w.charAt(1))) return true
    false
  }

  private def isShortWord(w: String): Boolean =
    endsInShortSyllable(w) && r1(w) >= w.length

  private def containsVowel(s: String): Boolean = s.exists(isVowel)

  private def step0(w: String): String =
    if (w.endsWith("'s'")) w.dropRight(3)
    else if (w.endsWith("'s")) w.dropRight(2)
    else if (w.endsWith("'")) w.dropRight(1)
    else w

  private def step1a(w: String): String = {
    if (w.endsWith("sses")) return w.dropRight(4) + "ss"
    if (w.endsWith("ied") || w.endsWith("ies")) {
      val stemPart = w.dropRight(3)
      return if (stemPart.length > 1) stemPart + "i" else stemPart + "ie"
    }
    if (w.endsWith("us") || w.endsWith("ss")) return w
    if (w.endsWith("s")) {
      // delete if the preceding part has a vowel NOT immediately before s
      val pre = w.dropRight(1)
      if (pre.dropRight(1).exists(isVowel)) return pre
    }
    w
  }

  private def step1b(w: String): String = {
    val r1p = r1(w)
    for (suf <- Seq("eedly", "eed"))
      if (w.endsWith(suf))
        return if (w.length - suf.length >= r1p) w.dropRight(suf.length) + "ee"
        else w
    for (suf <- Seq("ingly", "edly", "ing", "ed")) if (w.endsWith(suf)) {
      val stemPart = w.dropRight(suf.length)
      if (!containsVowel(stemPart)) return w
      if (stemPart.endsWith("at") || stemPart.endsWith("bl") ||
        stemPart.endsWith("iz")) return stemPart + "e"
      if (stemPart.length >= 2 && doubles.contains(stemPart.takeRight(2)))
        return stemPart.dropRight(1)
      if (isShortWord(stemPart)) return stemPart + "e"
      return stemPart
    }
    w
  }

  private def step1c(w: String): String = {
    val n = w.length
    if (n > 2 && (w.charAt(n - 1) == 'y' || w.charAt(n - 1) == 'Y') &&
      !isVowel(w.charAt(n - 2)))
      w.dropRight(1) + "i"
    else w
  }

  // (suffix, replacement) in longest-match order; special cases inline
  private val step2Rules = Seq(
    "ization" -> "ize", "fulness" -> "ful", "ousness" -> "ous",
    "iveness" -> "ive", "ational" -> "ate", "biliti" -> "ble",
    "tional" -> "tion", "lessli" -> "less", "ation" -> "ate",
    "alism" -> "al", "aliti" -> "al", "ousli" -> "ous", "iviti" -> "ive",
    "fulli" -> "ful", "entli" -> "ent", "enci" -> "ence", "anci" -> "ance",
    "abli" -> "able", "izer" -> "ize", "ator" -> "ate", "alli" -> "al",
    "bli" -> "ble", "ogi" -> "og", "li" -> "")

  private def step2(w: String): String = {
    val r1p = r1(w)
    for ((suf, rep) <- step2Rules) if (w.endsWith(suf)) {
      if (w.length - suf.length < r1p) return w // longest match not in R1: stop
      if (suf == "ogi")
        return if (w.length > 3 && w.charAt(w.length - 4) == 'l')
          w.dropRight(3) + "og" else w
      if (suf == "li")
        return if (w.length > 2 && validLi.contains(w.charAt(w.length - 3)))
          w.dropRight(2) else w
      return w.dropRight(suf.length) + rep
    }
    w
  }

  private val step3Rules = Seq(
    "ational" -> "ate", "tional" -> "tion", "alize" -> "al",
    "icate" -> "ic", "iciti" -> "ic", "ical" -> "ic",
    "ative" -> "", "ful" -> "", "ness" -> "")

  private def step3(w: String): String = {
    val r1p = r1(w)
    for ((suf, rep) <- step3Rules) if (w.endsWith(suf)) {
      if (w.length - suf.length < r1p) return w
      if (suf == "ative")
        return if (w.length - 5 >= r2(w)) w.dropRight(5) else w
      return w.dropRight(suf.length) + rep
    }
    w
  }

  private val step4Sufs = Seq(
    "ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
    "ion", "al", "er", "ic")

  private def step4(w: String): String = {
    val r2p = r2(w)
    for (suf <- step4Sufs) if (w.endsWith(suf)) {
      if (w.length - suf.length < r2p) return w
      if (suf == "ion")
        return if (w.length > 3 &&
          (w.charAt(w.length - 4) == 's' || w.charAt(w.length - 4) == 't'))
          w.dropRight(3) else w
      return w.dropRight(suf.length)
    }
    w
  }

  private def step5(w: String): String = {
    if (w.endsWith("e")) {
      val stemPart = w.dropRight(1)
      if (stemPart.length >= r2(w)) return stemPart
      if (stemPart.length >= r1(w) && !endsInShortSyllable(stemPart))
        return stemPart
      return w
    }
    if (w.endsWith("l") && w.length - 1 >= r2(w) && w.length > 1 &&
      w.charAt(w.length - 2) == 'l') return w.dropRight(1)
    w
  }
}
