package graft.llmops

import graft.SparkSpec

class QualitySpec extends SparkSpec {
  import spark.implicits._

  private def dirty = Seq(
    (1L, "hello world", 11L),
    (1L, "hello again", 11L),   // duplicate id
    (2L, null: String, 0L),     // null text, out-of-range n_chars
    (3L, "   ", 3L),            // whitespace-only text
    (4L, "fine doc", 8L)
  ).toDF("doc_id", "text", "n_chars")

  test("constraint report counts each violation class") {
    val r = Quality.report(dirty, Seq(
        Quality.Unique("doc_id"),
        Quality.NotNull("text"),
        Quality.NonEmpty("text"),
        Quality.InRange("n_chars", 1, 100)))
      .collect().map(x => x.getString(0) ->
        (x.getLong(2), x.getLong(3), x.getBoolean(4))).toMap
    assert(r("unique:doc_id") == ((1L, 5L, false)))
    assert(r("not_null:text") == ((1L, 5L, false)))
    // null text is not "empty"; only the whitespace-only row counts
    assert(r("non_empty:text") == ((1L, 5L, false)))
    assert(r("in_range:n_chars") == ((1L, 5L, false)))
  }

  test("NotNull tolerance: maxNullFrac admits bounded null rates") {
    val r = Quality.report(dirty, Seq(Quality.NotNull("text", maxNullFrac = 0.25)))
      .collect().head
    assert(r.getLong(2) == 1L && r.getBoolean(4)) // 1/5 <= 0.25 → pass
  }

  test("report is a single aggregate: one row per check, shared scan") {
    val checks = Seq(Quality.NotNull("text"), Quality.InRange("n_chars", 1, 100),
      Quality.NonEmpty("text"))
    val df = Quality.report(dirty, checks)
    assert(df.count() == checks.size)
    // no per-check scans: the plan contains exactly one Aggregate over
    // the input relation (uniqueness absent → no countDistinct shuffle)
    val plan = df.queryExecution.optimizedPlan.toString
    assert("(?s)LocalRelation|Relation".r.findAllIn(plan).nonEmpty)
  }

  test("vocab: stable ids, frequency-then-token order, minDf respected") {
    val docs = Seq("a b c", "a b", "a x", "z z z").toDF("text")
    val v = Quality.buildVocab(docs, "text", vocabSize = 3, minDf = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // df: a=3, b=2, others df=1 (z repeats within ONE doc → df 1)
    assert(v.toSeq == Seq(("a", 3L, 0L), ("b", 2L, 1L)))
  }

  test("chunking reconstructs the document when overlap is stripped") {
    val text = ('a' to 'z').mkString * 20 // 520 chars
    val docs = Seq((1L, text), (2L, "short")).toDF("doc_id", "text")
    val chunks = TextAnalysis.chunkDocs(docs, "doc_id", "text", 200, 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val c1 = chunks.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    assert(c1.head.length == 200)
    // strip the 50-char overlap from every chunk after the first
    val rebuilt = c1.head + c1.tail.map(_.drop(50)).mkString
    assert(rebuilt == text)
    // consecutive chunks agree on their 50-char overlap
    c1.sliding(2).foreach { case Array(a, b) =>
      assert(a.takeRight(50) == b.take(50))
    }
    assert(chunks.filter(_._1 == 2L).map(_._3).toSeq == Seq("short"))
  }

  test("packing: bins start at cumulative budget boundaries, per shard") {
    val docs = Seq(
      (1L, "w " * 300, "s1"), (2L, "w " * 300, "s1"), (3L, "w " * 300, "s1"),
      (4L, "w " * 10, "s2")
    ).map { case (i, t, s) => (i, t.trim, s) }.toDF("doc_id", "text", "source")
    val bins = TextAnalysis.packDocs(docs, "doc_id", "text", "source", 500)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // cum starts: 0, 300, 600 → bins 0, 0, 1; s2 independent → 0
    assert(bins == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 0L))
  }

  test("trigram commonness ranks fluent text above gibberish") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "the lazy dog sleeps near the quick river fox in the warm sun"),
      (3L, "over the river the brown fox and the dog rest in the sun"),
      (4L, "xq zvw qjk pzx wvq kjq zzx qqw jjz xxq wqz jkz zqx")
    ).toDF("doc_id", "text")
    val s = TextAnalysis.trigramCommonness(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(s(4L) < s(1L) && s(4L) < s(2L) && s(4L) < s(3L),
      s"gibberish should score lowest: $s")
  }

  test("unigram perplexity: hand-computed nll on a 3-token vocab, " +
      "rare-token doc scores higher, empty doc omitted") {
    // corpus: a=3, b=1, c=1; N=5, V=3 -> lp(a)=ln(4/8), lp(b|c)=ln(2/8)
    val docs = Seq((1L, "a a b"), (2L, "a c"), (3L, "   "))
      .toDF("doc_id", "text")
    val got = Quality.unigramPerplexity(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(!got.contains(3L), "empty doc must emit nothing")
    // doc1: sum 2*693147 + 1386294 = 2772588; floor(/3) = 924196
    assert(got(1L)._1 == 3L && got(1L)._2 == 2772588L
      && got(1L)._3 == 924196L, s"doc1 nll wrong: ${got(1L)}")
    // doc2: sum 693147 + 1386294 = 2079441; floor(/2) = 1039720
    // (ppl = exp(avg_nll_micro/1e6) ~ sqrt(8), derivable by callers)
    assert(got(2L)._1 == 2L && got(2L)._2 == 2079441L
      && got(2L)._3 == 1039720L, s"doc2 nll wrong: ${got(2L)}")
    assert(got(2L)._3 > got(1L)._3, "rarer tokens must raise the nll")
  }

  test("portable hash split: ~90/10, deterministic, partition-independent") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val b = graft.reco.Splits.hashBucketPortable(
      org.apache.spark.sql.functions.col("doc_id"), "42")
    val frac = docs.filter(b < 900000L).count().toDouble / docs.count()
    assert(frac > 0.8 && frac < 0.97, s"train frac $frac")
    val a1 = docs.select($"doc_id", b.as("bk")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a2 = docs.repartition(7).select($"doc_id", b.as("bk"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a1 == a2)
  }
}
