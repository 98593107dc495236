package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Porter2 (Snowball English) vectors — exceptional forms and the
  * spec's own worked examples, plus cases derived step-by-step from
  * the published algorithm definition. */
class Porter2Spec extends AnyFunSuite {

  test("exceptional forms (spec list)") {
    val cases = Map(
      "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
      "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl",
      "ugly" -> "ugli", "early" -> "earli", "only" -> "onli",
      "singly" -> "singl", "sky" -> "sky", "news" -> "news",
      "atlas" -> "atlas", "cosmos" -> "cosmos", "bias" -> "bias",
      "andes" -> "andes")
    cases.foreach { case (in, want) =>
      assert(Porter2Stemmer.stem(in) == want, s"stem($in)")
    }
  }

  test("post-1a invariants (spec list)") {
    Seq("inning", "outing", "canning", "herring", "earring",
      "proceed", "exceed", "succeed").foreach { w =>
      assert(Porter2Stemmer.stem(w) == w, s"stem($w)")
    }
  }

  test("step 1a: plural and s-deletion rules (spec examples)") {
    val cases = Map(
      "ties" -> "tie", "cries" -> "cri", // ied/ies by preceding length
      "gaps" -> "gap", "kiwis" -> "kiwi", // s with non-adjacent vowel
      "gas" -> "gas", "this" -> "this", // vowel only adjacent → keep
      "caresses" -> "caress")
    cases.foreach { case (in, want) =>
      assert(Porter2Stemmer.stem(in) == want, s"stem($in)")
    }
  }

  test("step 1b: eed/ed/ing with at-bl-iz, undoubling, short-word e") {
    val cases = Map(
      "agreed" -> "agre", "feed" -> "feed", // eed only in R1; step5 e-del
      "luxuriated" -> "luxuri", // at → +e in 1b, then step4 ate-del in R2
      "hopping" -> "hop", "tanned" -> "tan", // undouble
      "hoping" -> "hope", "filing" -> "file", // short word → +e
      "consolingly" -> "consol", // ingly
      "motoring" -> "motor")
    cases.foreach { case (in, want) =>
      assert(Porter2Stemmer.stem(in) == want, s"stem($in)")
    }
  }

  test("steps 1c-5: y→i, suffix chains, e/l deletion (derived)") {
    val cases = Map(
      "happy" -> "happi", "cry" -> "cri", "say" -> "say", "by" -> "by",
      "happiness" -> "happi", // ness in R1
      "consistency" -> "consist", // enci→ence, ence del in R2
      "conditional" -> "condit", // tional→tion, ion del after t
      "relational" -> "relat", // ational→ate, e del in R2
      "controlled" -> "control", // ll undouble via step 5
      "generously" -> "generous", // gener- R1 exception + ousli→ous
      "geology" -> "geolog") // ogi→og after l
    cases.foreach { case (in, want) =>
      assert(Porter2Stemmer.stem(in) == want, s"stem($in)")
    }
  }

  test("non-alphabetic and short tokens pass through") {
    assert(Porter2Stemmer.stem("c++") == "c++")
    assert(Porter2Stemmer.stem("ab") == "ab")
    assert(Porter2Stemmer.stem(null) == null)
    assert(Porter2Stemmer.stem("x2y") == "x2y")
  }
}
