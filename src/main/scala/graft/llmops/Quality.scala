package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-level quality gates for training-data pipelines: the
  * validation pass that runs BEFORE a corpus is admitted to training
  * (null rates, uniqueness, ranges), and vocabulary construction for
  * tokenizer builds.
  *
  * Scale design: the constraint report is ONE full-scan aggregation —
  * every per-column statistic is a conditional aggregate in the same
  * `agg(...)`, so 50 checks over 100 TB still cost a single pass, no
  * per-check jobs (the anti-pattern deequ-style frameworks avoid the
  * same way). Vocabulary build is one shuffle on token.
  */
object Quality {

  /** Declarative column constraint. */
  sealed trait Check { def name: String; def col: String }
  case class NotNull(col: String, maxNullFrac: Double = 0.0) extends Check {
    val name = s"not_null:$col"
  }
  case class Unique(col: String) extends Check { val name = s"unique:$col" }
  case class InRange(col: String, lo: Double, hi: Double) extends Check {
    val name = s"in_range:$col"
  }
  case class NonEmpty(col: String) extends Check {
    val name = s"non_empty:$col"
  }

  /** One row per check: (check, column, violations, total, pass) —
    * computed in a single scan + one global aggregate. Uniqueness is
    * the one check that needs its own shuffle (count-distinct per
    * column); it shares the scan via the same cached input when the
    * caller caches. */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val total = count(lit(1))
    val aggs: Seq[Column] = checks.flatMap {
      case NotNull(c, _) =>
        Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"))
      case InRange(c, lo, hi) =>
        Seq(sum(when(col(c) < lo || col(c) > hi, 1L).otherwise(0L))
          .as(s"ir_$c"))
      case NonEmpty(c) =>
        Seq(sum(when(length(trim(col(c))) === 0, 1L).otherwise(0L))
          .as(s"ne_$c"))
      case Unique(c) =>
        Seq((count(lit(1)) - countDistinct(col(c))).as(s"uq_$c"))
    }
    val one = df.agg(total.as("total"), aggs: _*)
    val spark = df.sparkSession
    import spark.implicits._
    val rows = checks.map {
      case NotNull(c, f) => (s"not_null:$c", c, s"nn_$c", f)
      case InRange(c, _, _) => (s"in_range:$c", c, s"ir_$c", 0.0)
      case NonEmpty(c) => (s"non_empty:$c", c, s"ne_$c", 0.0)
      case Unique(c) => (s"unique:$c", c, s"uq_$c", 0.0)
    }.toDF("check", "column", "key", "max_frac")
    // one agg row × small check table: broadcast the agg row via
    // crossJoin (1×N, no shuffle), then pick each check's counter with
    // a CASE over the bounded key set
    val counters = checks.map {
      case NotNull(c, _) => s"nn_$c"; case InRange(c, _, _) => s"ir_$c"
      case NonEmpty(c) => s"ne_$c"; case Unique(c) => s"uq_$c"
    }.distinct
    val caseExpr = counters.foldLeft(lit(null).cast("long")) { (acc, k) =>
      when(col("key") === k, col(k)).otherwise(acc)
    }
    rows.crossJoin(broadcast(one))
      .withColumn("violations", caseExpr)
      .withColumn("pass",
        col("violations") <= col("max_frac") * col("total"))
      .select(col("check"), col("column"), col("violations"),
        col("total"), col("pass"))
  }

  /** Tokenizer vocabulary: top `vocabSize` tokens by document
    * frequency with STABLE ids (freq desc, token asc — deterministic
    * across runs and engines). One shuffle on token, then a
    * TakeOrdered limit (per-partition top-k, no global sort of the
    * full distinct-token set); the row_number window runs only over
    * the already-bounded vocabSize rows. */
  def buildVocab(docs: DataFrame, textCol: String, vocabSize: Int,
      minDf: Int = 1): DataFrame = {
    val toks = docs
      .select(explode(array_distinct(split(trim(lower(col(textCol))), "\\s+")))
        .as("token"))
      .filter(col("token") =!= "")
    val byFreq = Window.orderBy(col("df").desc, col("token"))
    toks.groupBy(col("token"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .orderBy(col("df").desc, col("token"))
      .limit(vocabSize)
      .withColumn("token_id", row_number().over(byFreq).cast("long") - 1)
  }

  /** Language-model quality scoring (the CCNet-style perplexity
    * filter, Wenzek et al. 2020, with the n-gram LM reduced to a
    * unigram fit on the corpus itself): each doc's mean negative
    * log-likelihood under an add-1-smoothed unigram model —
    * lp(t) = ln((c_t + 1) / (N + V)) — flags machine-generated /
    * boilerplate text whose token distribution diverges from the
    * corpus. Per-token contributions are quantized to integer
    * micro-nats BEFORE summing (the Bm25 move), so doc scores are an
    * exact BIGINT sum — no float-sum order nondeterminism across
    * engines or partition layouts; the final mean is an exact integer
    * floor over that sum (late r17).
    *
    * Scale: one shuffle on token for the count table, one keyed join
    * of instances to counts (shuffle or broadcast — Catalyst picks by
    * vocab size), one shuffle on doc for the sum. Linear; no driver
    * state. Docs with zero tokens emit nothing.
    *
    * @return (doc_id, n_tokens, nll_sum_u, avg_nll_micro) per non-empty doc.
    */
  def unigramPerplexity(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val inst = docs.select(col(idCol).cast("long").as("doc_id"),
      explode(filter(split(lower(col(textCol)), "\\s+"),
        t => length(t) > 0)).as("t"))
    val counts = inst.groupBy(col("t")).agg(count(lit(1)).as("c"))
    val stats = counts.agg(sum(col("c")).as("n_tok"),
      count(lit(1)).as("v"))
    inst.join(counts, Seq("t"))
      .crossJoin(broadcast(stats))
      .withColumn("nll_u", (-round(log((col("c") + 1).cast("double") /
        (col("n_tok") + col("v")).cast("double")) * 1000000)).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("nll_u")).as("nll_sum_u"))
      // integer micro-nll mean (late r17): the rounded double avg_nll
      // and exp-derived ppl could flip at a half-way shortest-repr
      // boundary cross-engine (the q76 flake class); the floor of the
      // integer ratio is exact (numerator ≪ 2^53, non-integer rationals
      // ≥ 1/n from any integer ≫ 1 ulp). ppl, a monotone function of
      // this column, is derivable by callers: exp(avg_nll_micro/1e6).
      .select(col("doc_id"), col("n_tokens"), col("nll_sum_u"),
        floor(col("nll_sum_u").cast("double") / col("n_tokens"))
          .cast("long").as("avg_nll_micro"))
  }

  /** Interpolated bigram LM perplexity — the KenLM-lite upgrade of
    * [[unigramPerplexity]]: per adjacent token pair,
    * p(w2|w1) = λ·c(w1 w2)/c(w1) + (1−λ)·(c(w2)+1)/(N+V), summed as
    * integer micro-nats (one libm log per instance, rounded BEFORE the
    * order-independent Long sum — the q84/q102 portability move). The
    * interpolation term means unseen contexts degrade to the smoothed
    * unigram score instead of −∞, which is what makes the filter
    * usable on short/rare text.
    *
    * Scale: bigram extraction is a lead() window on the doc key (one
    * shuffle); the bigram/unigram count tables shuffle on their own
    * keys and join back keyed or broadcast as Catalyst sizes them;
    * corpus totals are a broadcast scalar. Linear end to end. Docs
    * with fewer than two tokens emit nothing (no bigram evidence).
    *
    * @return (doc_id, n_bigrams, nll_sum_u, avg_nll_micro) per doc with ≥2 tokens.
    */
  def bigramPerplexity(docs: DataFrame, idCol: String, textCol: String,
      lambda: Double = 0.7): DataFrame = {
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
        posexplode(filter(split(lower(col(textCol)), "\\s+"),
          t => length(t) > 0)))
      .toDF("doc_id", "pos", "t")
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val bigr = toks
      .withColumn("t2", lead(col("t"), 1).over(w))
      .filter(col("t2").isNotNull)
      .select(col("doc_id"), col("t").as("w1"), col("t2").as("w2"))
    val c2 = bigr.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val c1 = toks.groupBy(col("t")).agg(count(lit(1)).as("c1"))
    val stats = c1.agg(sum(col("c1")).as("n_tok"), count(lit(1)).as("v"))
    val p =
      lit(lambda) * (col("c2").cast("double") / col("c1a").cast("double")) +
        lit(1.0 - lambda) * ((col("c1b") + 1).cast("double") /
          (col("n_tok") + col("v")).cast("double"))
    bigr
      .join(c2, Seq("w1", "w2"))
      .join(c1.select(col("t").as("w1"), col("c1").as("c1a")), Seq("w1"))
      .join(c1.select(col("t").as("w2"), col("c1").as("c1b")), Seq("w2"))
      .crossJoin(broadcast(stats))
      .withColumn("nll_u", (-round(log(p) * 1000000)).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("nll_u")).as("nll_sum_u"))
      // integer micro-nll mean — same portability rationale as
      // [[unigramPerplexity]] (late r17)
      .select(col("doc_id"), col("n_bigrams"), col("nll_sum_u"),
        floor(col("nll_sum_u").cast("double") / col("n_bigrams"))
          .cast("long").as("avg_nll_micro"))
  }

  /** Token-budgeted best-first selection per source — the "data
    * recipe" admission step: each source contributes its
    * highest-quality docs until its token budget is spent (greedy
    * prefix of the quality order; a doc that would overflow the budget
    * ends the source's intake — knapsack-refilling past it is not a
    * windowed computation and not what recipe tooling does either).
    * Deterministic: quality ties break on the id.
    *
    * Scale: one shuffle on the source key; the quality sort and the
    * running token sum share that partitioning. Budgets are per
    * source, so no global coordination exists at all — each source's
    * intake closes independently on its own executor partition. */
  def budgetedSelection(docs: DataFrame, srcCol: String, idCol: String,
      tokenExpr: Column, qualityExpr: Column, budgetPerSource: Long)
      : DataFrame = {
    val w = Window.partitionBy(col(srcCol))
      .orderBy(col("quality").desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col(idCol), col(srcCol), tokenExpr.as("tok"),
        qualityExpr.as("quality"))
      .withColumn("cum_tok", sum(col("tok")).over(w))
      .withColumn("admitted", col("cum_tok") <= budgetPerSource)
  }

  /** DSIR-style importance scores (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): hashed-unigram
    * bag-of-words models for a TARGET slice (`targetPred` over the doc
    * row) vs the full SOURCE corpus; per-doc importance =
    * Σ_tokens log(p_target(bucket) / p_source(bucket)), add-1
    * smoothed, in integer micro-nats (the q84/q102 portability move:
    * one libm log per bucket, rounded BEFORE the order-independent
    * Long summation).
    *
    * Scale shape: both models are `nBuckets`-sized count vectors —
    * constant-size artifacts that broadcast (the point of hashing the
    * vocabulary); scoring is one scan with a broadcast lookup + one
    * keyed sum. At 100 TB the models come from hash-samples and the
    * scorer streams the corpus once. */
  def dsirScores(docs: DataFrame, targetPred: Column, idCol: String,
      textCol: String, nBuckets: Int = 1024): DataFrame = {
    val inst = docs.select(col(idCol).cast("long").as("doc_id"),
        targetPred.as("is_target"),
        explode(filter(split(lower(col(textCol)), "\\s+"),
          t => length(t) > 0)).as("t"))
      .withColumn("b", conv(substring(md5(col("t")), 1, 8), 16, 10)
        .cast("long") % nBuckets)
    val srcCounts = inst.groupBy(col("b")).agg(count(lit(1)).as("cs"))
    val tgtCounts = inst.filter(col("is_target"))
      .groupBy(col("b")).agg(count(lit(1)).as("ct"))
    val totals = inst.agg(count(lit(1)).as("s_tot"),
      sum(when(col("is_target"), 1L).otherwise(0L)).as("t_tot"))
    val lam = srcCounts.join(tgtCounts, Seq("b"), "left")
      .withColumn("ctn", coalesce(col("ct"), lit(0L)))
      .crossJoin(broadcast(totals))
      .withColumn("lambda_u", round(log(
          ((col("ctn") + 1).cast("double") /
            (col("t_tot") + nBuckets).cast("double")) /
          ((col("cs") + 1).cast("double") /
            (col("s_tot") + nBuckets).cast("double"))) * 1000000)
        .cast("long"))
      .select(col("b"), col("lambda_u"))
    inst.join(broadcast(lam), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("lambda_u")).as("dsir_score_u"))
  }
}
