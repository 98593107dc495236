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
}
