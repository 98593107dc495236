package graft.queries

import graft.QueryDef
import graft.ml.RankerPipeline
import graft.reco.{ContentRecommender, Interactions}
import graft.sources.Tables
import graft.text.{PorterStemmer, Tokenize}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ML/text pipeline operator coverage (SURVEY.md §2.10). */
object Ml {

  /** TF-IDF similar-docs via prefix-filtered inverted-index join (the
    * ES More-Like-This replacement, SURVEY.md §7.3; exact variant in
    * ContentRecommender.similarDocs, spec-covered). */
  def tfidfSimilarDocs(spark: SparkSession, dir: String): DataFrame =
    ContentRecommender.similarDocsPrefix(Tables.documents(spark, dir),
        "doc_id", "text", k = 5, m = 4)
      .select(col("id_a"), col("id_b"), round(col("score"), 6).as("score"),
        col("rn").cast("long").as("rn"))
      .orderBy(col("id_a"), col("rn"))

  /** Tokenize + Porter-stem the corpus; emits sorted distinct stems per
    * doc (rows-only: Porter not expressible in DuckDB). */
  def stemmedTokens(spark: SparkSession, dir: String): DataFrame = {
    val stemUdf = udf((ts: Seq[String]) => ts.map(PorterStemmer.stem))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        array_join(array_sort(array_distinct(
          stemUdf(Tokenize.removeStopwords(Tokenize.cjkAware(col("text")),
            Tokenize.englishStopwords)))), " ").as("stems"))
      .orderBy(col("doc_id"))
  }

  /** Word2Vec over tokenized docs; nearest neighbors of a probe word in
    * the embedding space (seeded; rows-only). */
  def word2vecSynonyms(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.feature.Word2Vec
    val corpus = Tables.documents(spark, dir)
      .select(Tokenize.cjkAware(col("text")).as("words"))
    val w2v = new Word2Vec()
      .setInputCol("words").setOutputCol("vec")
      .setVectorSize(32).setMinCount(5).setMaxIter(4).setSeed(42)
      .setWindowSize(5)
    val model = w2v.fit(corpus)
    model.findSynonyms("merge", 10)
      .select(col("word"), round(col("similarity"), 6).as("similarity"))
      .orderBy(col("similarity").desc, col("word"))
  }

  /** Two-stage LR ranking pipeline end-to-end metrics (rows-only). */
  def lrRankerMetrics(spark: SparkSession, dir: String): DataFrame =
    RankerPipeline.endToEnd(spark,
      Interactions.fromEvents(spark, dir),
      splitNs = 1706054400000000000L) // 2024-01-24 UTC

  private val stopList =
    Tokenize.englishStopwords.map("'" + _ + "'").mkString(",")

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q41_tfidf_similar_docs", tfidfSimilarDocs, Some(
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(list_filter(
         |    regexp_extract_all(lower(text), '([a-z0-9]+(?:\\+\\+|#)?)', 1),
         |    w -> (len(w) > 1 OR w IN ('c','r')) AND NOT list_contains([$stopList], w)
         |  )) AS term
         |  FROM documents),
         |n AS (SELECT count(*) AS n FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |fdf AS (SELECT term, df FROM df, n WHERE df <= CAST(floor(n.n * 0.8) AS BIGINT)),
         |w AS (SELECT tf.doc_id, tf.term,
         |        tf.tf * (ln((n.n + 1.0) / (fdf.df + 1.0)) + 1.0) AS w_raw
         |      FROM tf JOIN fdf USING (term) CROSS JOIN n),
         |norms AS (SELECT doc_id, sqrt(sum(w_raw * w_raw)) AS norm
         |          FROM w GROUP BY 1),
         |wn AS (SELECT w.doc_id, w.term, w.w_raw / norms.norm AS wt
         |       FROM w JOIN norms USING (doc_id)),
         |prefix AS (SELECT doc_id, term, wt FROM (
         |    SELECT doc_id, term, wt,
         |      row_number() OVER (PARTITION BY doc_id
         |                         ORDER BY wt DESC, term) AS pr
         |    FROM wn) WHERE pr <= 4),
         |sims AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |           sum(a.wt * b.wt) AS score
         |         FROM prefix a JOIN prefix b
         |           ON a.term = b.term AND a.doc_id != b.doc_id
         |         GROUP BY 1, 2),
         |r AS (SELECT id_a, id_b, round(score, 6) AS score,
         |        row_number() OVER (PARTITION BY id_a
         |                           ORDER BY score DESC, id_b) AS rn
         |      FROM sims)
         |SELECT id_a, id_b, score, rn FROM r WHERE rn <= 5
         |ORDER BY id_a, rn""".stripMargin)),
    QueryDef("q42_porter_stems", stemmedTokens, None),
    QueryDef("q47_cv_grid_search", (s: SparkSession, d: String) =>
      RankerPipeline.crossValidate(s, Interactions.fromEvents(s, d)), None),
    QueryDef("q43_word2vec_synonyms", word2vecSynonyms, None),
    QueryDef("q44_lr_ranker_metrics", lrRankerMetrics, None)
  )
}
