package graft.text

/** Golden Porter2 (Snowball English) test vectors.
  *
  * Sourced from the PUBLISHED algorithm definition
  * (snowballstem.org/algorithms/english/stemmer.html): the two
  * exception lists are reproduced verbatim; the worked examples are the
  * spec's own (step 1a plural handling, step 1b at/bl/iz + undoubling +
  * short-word e, the ogi/li conditions); the remaining pairs are
  * hand-derived step-by-step from the spec text (R1/R2 regions, suffix
  * ladders, step-5 e/l deletion) — each derivation is annotated. The
  * full 29k-word voc.txt/output.txt distribution pair is not
  * redistributable into this offline build, so this curated set is the
  * external truth surface: q42b stems `word` and the DuckDB oracle
  * replays `expected` as plain VALUES — any stemmer drift breaks the
  * hash compare in the driver gate, not just a spec.
  *
  * Reference contract analog: ws/vinta/albedo/transformers/
  * SnowballStemmer.scala:7-18 (thin wrapper over the same published
  * algorithm).
  */
object PorterGolden {

  /** (word, expected Porter2 stem) — external golden truth. */
  val vectors: Seq[(String, String)] = Seq(
    // --- exceptional forms (spec exception list 1, verbatim) ---------
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die",
    "lying" -> "lie", "tying" -> "tie",
    "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl",
    "sky" -> "sky", "news" -> "news", "howe" -> "howe",
    "atlas" -> "atlas", "cosmos" -> "cosmos", "bias" -> "bias",
    "andes" -> "andes",
    // --- post-1a invariants (spec exception list 2, verbatim) --------
    "inning" -> "inning", "outing" -> "outing", "canning" -> "canning",
    "herring" -> "herring", "earring" -> "earring",
    "proceed" -> "proceed", "exceed" -> "exceed", "succeed" -> "succeed",
    // --- step 1a: sses / ies / s (spec examples) ---------------------
    "caresses" -> "caress", "ties" -> "tie", "cries" -> "cri",
    "ponies" -> "poni", "gaps" -> "gap", "kiwis" -> "kiwi",
    "gas" -> "gas", "this" -> "this",
    // --- step 1b: eed/ed/ing, at-bl-iz, undoubling, short-word e -----
    "agreed" -> "agre", // eed→ee in R1, then step-5 e-deletion
    "feed" -> "feed", // eed not in R1 (R1 empty)
    "luxuriated" -> "luxuri", // ed del, at→ate, step-4 ate del in R2
    "conflated" -> "conflat", // at→ate, ate NOT in R2, step-5 e del
    "troubled" -> "troubl", // bl→ble, step-5 e in R2 del
    "sized" -> "size", // iz→ize, e kept (short syllable)
    "hopping" -> "hop", "tanned" -> "tan", "fizzed" -> "fizz", // undouble
    "falling" -> "fall", "hissing" -> "hiss", "failing" -> "fail",
    "hoping" -> "hope", "filing" -> "file", // short word → +e
    "running" -> "run", "motoring" -> "motor", "arguing" -> "argu",
    // --- step 1c: y→i after consonant, length > 2 --------------------
    "happy" -> "happi", "cry" -> "cri", "by" -> "by", "say" -> "say",
    // --- step 2 suffix map (derived per spec R1 checks) --------------
    "consistency" -> "consist", // enci→ence, then ence del in R2
    "conditional" -> "condit", // tional→tion, ion del after t in R2
    "relational" -> "relat", // ational→ate in R1, ate del in R2
    "probably" -> "probabl", // y→i, abli→able, step-5 e del in R2
    "generously" -> "generous", // gener- R1 exception + ousli→ous
    "consolingly" -> "consol", // ingly del, step-2 nothing
    "geology" -> "geolog", // y→i, ogi→og (preceded by l)
    "communication" -> "communic", // commun- R1 exc, ation→ate, icate→ic
    // --- steps 3-4: residual suffix deletion in R2 -------------------
    "national" -> "nation", // step-4 al in R2 (ational NOT in R1)
    "adjustment" -> "adjust", // ment in R2
    "argument" -> "argument", // ment NOT in R2 (the Porter1 divergence)
    "defensible" -> "defens", // ible in R2
    "happiness" -> "happi", // y→i, ness del in R1
    "generate" -> "generat", // gener- exc; ate not in R2; e in R2 del
    // --- step 5: e / l deletion --------------------------------------
    "horses" -> "hors", // s del, e in R2 del
    "knives" -> "knive", // s del, e kept: preceded by short syllable
    "controlled" -> "control", // ed del, ll undouble via step 5
    "rate" -> "rate", // e in R1 but preceded by short syllable → kept
    "cease" -> "ceas") // e in R2 → deleted

  /** The oracle side: a DuckDB VALUES relation of the golden truth. */
  def oracleValuesSql: String = {
    val rows = vectors
      .map { case (w, s) => s"('$w', '$s')" }
      .mkString(",\n       ")
    s"""SELECT word, stem FROM (VALUES
       $rows) AS golden(word, stem)
       ORDER BY word"""
  }
}
