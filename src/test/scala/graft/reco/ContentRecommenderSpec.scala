package graft.reco

import graft.SparkSpec

class ContentRecommenderSpec extends SparkSpec {
  import spark.implicits._

  private def toy = Seq(
    (1L, "spark catalyst optimizer rules engine"),
    (2L, "spark catalyst optimizer rules framework"), // ≈ doc 1
    (3L, "parquet columnar storage format files"),
    (4L, "cooking pasta with tomato sauce dinner")
  ).toDF("doc_id", "text")

  test("similar docs ranks the near-identical doc first") {
    val sims = ContentRecommender.similarDocs(toy, "doc_id", "text", k = 2)
      .select("id_a", "id_b", "rn").as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toList).toMap
    assert(sims(1L).head == 2L)
    assert(sims(2L).head == 1L)
    // disjoint-vocab doc has no neighbors at all
    assert(!sims.contains(4L))
  }

  test("tfidf weights are L2-normalized per doc") {
    val norms = ContentRecommender.tfidfWeights(toy, "doc_id", "text")
      .groupBy($"id")
      .agg(org.apache.spark.sql.functions.sum($"w" * $"w").as("n2"))
      .select("n2").as[Double].collect()
    norms.foreach(n => assert(math.abs(n - 1.0) < 1e-12))
  }
}
