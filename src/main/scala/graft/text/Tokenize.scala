package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tokenization for mixed Latin/CJK text.
  *
  * Contract from the reference's HanLPTokenizer (reference:
  * src/main/scala/ws/vinta/albedo/transformers/HanLPTokenizer.scala:39-58):
  * lowercase; keep programming-language tokens `c`/`r`/`c++`/`c#`/`f#`;
  * drop 1-char non-CJK tokens; CJK runs segmented (here: per character —
  * documented delta: no dictionary segmentation, HanLP unavailable
  * offline). Pure column expressions (regexp_extract_all) — codegen'd.
  */
object Tokenize {

  private val tokenPattern =
    "([a-z0-9]+(?:\\+\\+|#)?|[\\u4e00-\\u9fff])"

  /** Tokenize mixed text: latin words (with c++/c# suffixes), numbers,
    * single CJK chars. */
  def cjkAware(text: Column): Column = {
    val toks = regexp_extract_all(lower(coalesce(text, lit(""))),
      lit(tokenPattern), lit(1))
    // drop 1-char non-CJK tokens except the whitelisted "c"/"r"
    filter(toks, t =>
      (length(t) > 1) ||
        t.rlike("^[\\u4e00-\\u9fff]$") ||
        t.isin("c", "r"))
  }

  /** Remove stopwords (lowercased membership). */
  def removeStopwords(tokens: Column, stopwords: Seq[String]): Column =
    filter(tokens, t => !array_contains(lit(stopwords.toArray), t))

  val englishStopwords: Seq[String] =
    graft.llmops.TextAnalysis.englishStopwords ++ Seq(
      "i", "you", "he", "she", "we", "they", "not", "no", "but", "if",
      "then", "so", "from", "have", "has", "had", "do", "does", "did")
}
