package graft.text

/** Golden truth for the frequency-weighted CJK lattice segmenter
  * (q174, r14 — VERDICT r13 #1): hand-derived correct readings of
  * ambiguous phrases, the q42b/PorterGolden pattern applied to
  * segmentation. Every discriminating case here is one where the
  * UNIFORM-cost lattice (or greedy FMM) picks the wrong reading and
  * only the log-frequency edge costs decide it — e.g. 白天鹅 is
  * 白/天鹅 ("white swan"), but both readings cost 2·WordCost under
  * uniform pricing and the longest-first tie-break picks 白天/鹅
  * ("daytime goose"). The expected segmentations are external
  * linguistic truth (the standard readings), NOT engine output
  * captured back — a regression in the frequency table or the DP
  * cannot self-justify.
  *
  * Reference behavior covered: src/main/scala/ws/vinta/albedo/
  * transformers/HanLPTokenizer.scala:30-34 (HanLP dictionary/Viterbi
  * segmentation weighted by CoreDictionary corpus frequencies). */
object CjkGolden {

  /** (phrase, expected segmentation joined by '/'). */
  val vectors: Seq[(String, String)] = Seq(
    // overlap ambiguity, same word count both ways — frequency decides
    "白天鹅" -> "白/天鹅", // white swan, not daytime goose
    "发展中国家" -> "发展/中/国家", // developing country, not ...中国/家
    // FMM strands 命; uniform DP ties once 命 is in-vocabulary and the
    // tie-break takes 研究生 — frequency restores the correct reading
    "研究生命科学" -> "研究/生命/科学",
    // the SAME 白天 is the right reading in daytime context — the
    // preference is frequency-in-context, not a blanket rule
    "今天白天天气好" -> "今天/白天/天气/好",
    // common compounds must beat their cheap function-char splits
    "大家一起去公园" -> "大家/一起/去/公园",
    "我们一起学习机器学习" -> "我们/一起/学习/机器学习",
    "他们在大学学习数据科学" -> "他们/在/大学/学习/数据科学",
    "中国人工智能发展" -> "中国/人工智能/发展",
    // OOV char (黑) degrades to a single without derailing neighbors
    "白天鹅和黑天鹅" -> "白/天鹅/和/黑/天鹅")

  /** The oracle side: a DuckDB VALUES relation of the golden truth. */
  def oracleValuesSql: String = {
    val rows = vectors.zipWithIndex
      .map { case ((p, seg), i) =>
        s"(CAST(${i + 1} AS BIGINT), '$p', '$seg')"
      }
      .mkString(",\n       ")
    s"""SELECT phrase_id, phrase, segmented FROM (VALUES
       $rows) AS golden(phrase_id, phrase, segmented)
       ORDER BY phrase_id"""
  }
}
