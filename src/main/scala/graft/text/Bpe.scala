package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training (Sennrich, Haddow & Birch, ACL
  * 2016) as iterative DataFrame rounds — the tokenizer-training stage
  * of a training-data pipeline, distributed the way BPE actually
  * scales: ONE corpus scan builds the word-frequency table, then every
  * merge round runs over that compact vocabulary (Heaps-law bounded,
  * independent of corpus row count), never over the corpus again. At
  * 100 TB the scan is the only corpus-sized job; the training loop
  * touches ~10⁵–10⁶ (word, count) rows regardless of scale.
  *
  * Round structure (all declarative, no driver-side state beyond the
  * loop counter):
  *   1. posexplode each word's symbol array; pair (sym, next) via a
  *      per-word lead window;
  *   2. pair totals = groupBy(pair).sum(word count); best pair =
  *      deterministic argmax (total DESC, left, right) — a 1-row frame
  *      cross-joined back (broadcast; never collected);
  *   3. greedy left-to-right merge application WITHOUT sequential
  *      state: mark matches, group CONSECUTIVE matched positions into
  *      runs (pos − rank-among-matches is constant within a run), keep
  *      the odd-indexed match of each run (run parity ≡ the greedy
  *      scan's choice on overlap chains like "aaaa"+(a,a) → aa|aa),
  *      drop the symbol consumed by the kept match to its left, and
  *      re-assemble with a sorted collect_list.
  *
  * Each round's output is `localCheckpoint`ed: the exploded frame
  * feeds both the pair count and the merge application, and `best`
  * feeds both the merge and the result table, so without truncation
  * the logical plan doubles per round (2^rounds leaves — the PageRank
  * lineage lesson, ops/PageRank.scala). State per round is the vocab
  * table itself (bounded), so checkpoint cost is flat.
  *
  * The word-frequency seam also makes the DuckDB oracle exact: every
  * round is pure integer/string logic (no floats anywhere), so the
  * whole training chain — pair counts, argmax chain, run-parity merge
  * application and final segmentations — replays hash-for-hash from
  * an unrolled CTE chain (`bpeOracle*` in queries/Llm.scala).
  *
  * Reference corollary: the reference's text stack stops at
  * whitespace/CJK tokenization (transformers/HanLPTokenizer.scala);
  * subword training is part of the beyond-reference llmops surface
  * (builder prompt: "token counting (whitespace + a BPE-ish regex)" —
  * this is the real thing the regex estimates).
  */
object Bpe {

  val EndOfWord = "</w>"

  /** Word-frequency table over lowercase ASCII-alpha tokens: the one
    * corpus-sized scan. `maxWords` bounds every downstream round
    * (TakeOrdered — no full sort); ties break lexicographically so the
    * table is deterministic under any partitioning. */
  def wordTable(docs: DataFrame, textCol: String, maxWords: Int): DataFrame =
    docs
      .select(explode(split(lower(col(textCol)), "\\s+")).as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(maxWords)

  /** Initial symbolization: characters plus the end-of-word marker
    * (the marker lets merges learn suffixes — classic Sennrich setup).
    * substr-by-position rather than split-on-empty so the DuckDB
    * replay is byte-identical. */
  def symbolize(words: DataFrame): DataFrame =
    words.withColumn("syms",
      concat(
        expr("transform(sequence(1, length(word)), i -> substr(word, i, 1))"),
        array(lit(EndOfWord))))

  /** One merge round. Returns (best-pair 1-row frame with columns
    * l/r/pair_count, vocabulary with the merge applied). */
  private def mergeRound(words: DataFrame): (DataFrame, DataFrame) = {
    val byPos = Window.partitionBy("word").orderBy("pos")
    val exploded = words
      .select(col("word"), col("cnt"), posexplode(col("syms")).as(Seq("pos", "sym")))
      .withColumn("nxt", lead(col("sym"), 1).over(byPos))
      .transform(graft.ops.Checkpoints.cut(_))

    val best = exploded
      .filter(col("nxt").isNotNull)
      .groupBy(col("sym").as("l"), col("nxt").as("r"))
      .agg(sum(col("cnt")).as("pair_count"))
      .orderBy(col("pair_count").desc, col("l"), col("r"))
      .limit(1)
      .transform(graft.ops.Checkpoints.cut(_))

    val amongMatches = Window.partitionBy(col("word"), col("m")).orderBy("pos")
    val withinRun = Window.partitionBy(col("word"), col("grp")).orderBy("pos")
    val merged = exploded
      .crossJoin(broadcast(best))
      .withColumn("m", col("sym") === col("l") &&
        coalesce(col("nxt") === col("r"), lit(false)))
      .withColumn("grp",
        when(col("m"), col("pos") - row_number().over(amongMatches)))
      .withColumn("keep",
        col("m") && row_number().over(withinRun) % 2 === 1)
      .withColumn("consumed",
        coalesce(lag(col("keep"), 1).over(byPos), lit(false)))
      .filter(!col("consumed"))
      .withColumn("out",
        when(col("keep"), concat(col("sym"), col("nxt"))).otherwise(col("sym")))
      .groupBy(col("word"), col("cnt"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, out))), x -> x.out)")
        .as("syms"))
    (best, merged)
  }

  /** Train `rounds` merges. Returns (merge table: merge_rank/left_sym/
    * right_sym/pair_count, final segmented vocabulary). */
  def train(docs: DataFrame, textCol: String, maxWords: Int, rounds: Int)
      : (DataFrame, DataFrame) = {
    var words = graft.ops.Checkpoints.cut(symbolize(wordTable(docs, textCol, maxWords)))
    var merges = Vector.empty[DataFrame]
    for (rank <- 1 to rounds) {
      val (best, next) = mergeRound(words)
      merges :+= best.select(
        lit(rank).as("merge_rank"),
        col("l").as("left_sym"), col("r").as("right_sym"), col("pair_count"))
      words = graft.ops.Checkpoints.cut(next)
    }
    (merges.reduce(_ unionAll _), words)
  }
}
