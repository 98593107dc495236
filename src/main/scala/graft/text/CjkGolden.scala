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
    "白天鹅和黑天鹅" -> "白/天鹅/和/黑/天鹅",
    // ---- r15 breadth additions (VERDICT r14 #5): ≥20 golden
    // readings over the broadened curated lexicon, including
    // OOV-adjacent ambiguities. Readings are standard linguistic
    // truth, hand-derived, not engine output captured back. -------
    // the textbook overlap chain: city compound beats the 市长 trap
    "南京市长江大桥" -> "南京市/长江/大桥",
    // compound boundary: Beijing college-students, not PKU + strand
    "北京大学生" -> "北京/大学生",
    // 研究生 trap again, different right-hand continuation
    "研究生物学" -> "研究/生物学",
    // frequency must prefer the fused counter word 一个 over 一/个
    "这是一个问题" -> "这/是/一个/问题",
    // one long institutional compound beats its constituent parse
    "中华人民共和国成立" -> "中华人民共和国/成立",
    // proper-noun compound chain with no ambiguity fallback
    "上海浦东机场" -> "上海/浦东/机场",
    // OOV-adjacent: an out-of-vocabulary NAME (张伟) degrades to
    // per-char singles without derailing the 北京大学 compound —
    // and the compound must beat 北京/大学 right next to the OOV run
    "张伟在北京大学学习" -> "张/伟/在/北京大学/学习",
    // the 白天 trap adjacent to a LONGER compound (velvet, not
    // daytime + stranded chars)
    "白天鹅绒" -> "白/天鹅绒",
    // station compound beats 火车 + stranded 站
    "火车站在前面" -> "火车站/在/前面",
    // domain compounds with a function char between them
    "人工智能和机器学习" -> "人工智能/和/机器学习",
    // the 研究所 garden path: "we study all problems", not
    // "our institute has problems"
    "我们研究所有问题" -> "我们/研究/所有/问题",
    // 量子 must not split; 计算机 must not yield 计算/机
    "量子计算机很快" -> "量子/计算机/很/快",
    // the 白/天鹅 reading embedded mid-sentence after a compound
    "湖边有一只白天鹅" -> "湖边/有/一只/白/天鹅",
    // overlap: tomorrow-rain, not 明/天下/雨 (天下 is a real word)
    "明天下雨" -> "明天/下雨",
    // compound-boundary resolution inside overlapping domain
    // compounds: NLP = 自然语言/处理, not 自然/语言处理
    "关于自然语言处理的研究" -> "关于/自然语言/处理/的/研究",
    // OOV-adjacent: a transliterated OOV run (阿尔法) degrades
    // per-char without absorbing the following dictionary words
    "阿尔法狗下围棋" -> "阿/尔/法/狗/下/围棋",
    // ---- late-r17 additions over the real-word breadth sweep: the
    // sweep's new cheap singles (得/中/间/部/分/件...) create exactly
    // the compound-vs-split decisions these pin. Readings are
    // standard linguistic truth, hand-derived first. --------------
    // 得到 must beat the now-cheap 得/到 split
    "他得到了一本书" -> "他/得到/了/一/本/书",
    // 中间 must survive 中 and 间 both being cheap words
    "他站在中间" -> "他/站/在/中间",
    // 部分 must beat 部/分 (both now priced as words)
    "这部分内容很重要" -> "这/部分/内容/很/重要",
    // full-sentence coverage over the swept vocabulary: measure word
    // 件 reads as its own token between numeral and noun
    "我妹妹昨天买了两件新衣服" -> "我/妹妹/昨天/买/了/两/件/新/衣服",
    // OOV verb (发) degrades to a single between dictionary words
    "经理让我把报告发给客户" -> "经理/让/我/把/报告/发/给/客户",
    // swept family/time/activity vocabulary end to end
    "爷爷每天早上在公园里散步" -> "爷爷/每天/早上/在/公园/里/散步")

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
