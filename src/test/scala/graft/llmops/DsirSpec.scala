package graft.llmops

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** [[Quality.dsirScores]] (gate q118): weight signs on a constructed
  * corpus, per-doc additivity, and target-slice separation on the
  * fixture. */
class DsirSpec extends SparkSpec {

  private def df(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "lang", "text")
  }

  test("target-exclusive tokens score positive, source-exclusive negative") {
    // target docs say only "alpha", non-target only "omega"
    val docs = df(Seq(
      (0L, "en", "alpha alpha alpha"),
      (1L, "en", "alpha alpha"),
      (2L, "xx", "omega omega omega"),
      (3L, "xx", "omega omega")))
    val out = Quality.dsirScores(docs, col("lang") === "en",
        "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(0L) > 0 && out(1L) > 0, s"target docs must score > 0: $out")
    assert(out(2L) < 0 && out(3L) < 0, s"source-only docs must score < 0: $out")
  }

  test("doc score is the sum of its tokens' bucket weights") {
    // same corpus: doc3 = gamma×3, doc2 = gamma×1 → exactly 3× score;
    // n_tokens counts instances
    val docs = df(Seq(
      (0L, "en", "alpha beta"),
      (1L, "xx", "beta delta"),
      (2L, "xx", "gamma"),
      (3L, "xx", "gamma gamma gamma")))
    val rows = Quality.dsirScores(docs, col("lang") === "en",
        "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows(0L)._1 == 2 && rows(2L)._1 == 1 && rows(3L)._1 == 3)
    assert(rows(3L)._2 == 3 * rows(2L)._2,
      s"3x token doc must score 3x: ${rows(2L)} vs ${rows(3L)}")
  }

  test("fixture: English docs average above non-English") {
    val out = Quality.dsirScores(Tables.documents(spark, sf0001),
      col("lang") === "en", "doc_id", "text")
    val joined = out.join(Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang")), Seq("doc_id"))
      .withColumn("per_tok",
        col("dsir_score_u").cast("double") / col("n_tokens"))
    val en = joined.filter(col("lang") === "en")
      .agg(avg(col("per_tok"))).head().getDouble(0)
    val rest = joined.filter(col("lang") =!= "en")
      .agg(avg(col("per_tok"))).head().getDouble(0)
    assert(en > rest,
      s"target slice must out-score the rest: en=$en rest=$rest")
  }
}
