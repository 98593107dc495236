package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HybridSearchSpec extends SparkSpec {
  import spark.implicits._

  test("query likelihood ranks term-dense docs first and smooths " +
      "zero-tf docs to finite scores") {
    val docs = Seq(
      (1L, "spark spark spark filler filler"),
      (2L, "spark filler filler filler filler"),
      (3L, "filler filler filler filler filler")
    ).toDF("doc_id", "text")
    val out = HybridSearch.queryLikelihood(docs, "doc_id", "text",
      Seq("spark"), mu = 10.0, topK = 3).orderBy("rank").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // doc 3 has tf=0 but a finite smoothed score (no -inf / null)
    assert(!out(2).isNullAt(1))
  }

  test("rrf fusion: hand-computed contributions, absent ranks as 0") {
    val a = Seq((10L, 1L), (20L, 2L)).toDF("doc_id", "rank")
    val b = Seq((10L, 1L), (30L, 2L)).toDF("doc_id", "rank")
    val out = HybridSearch.rrfFuse(a, b, k = 60, topK = 10)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 10: in both at rank 1 -> 2 * (1000000 DIV 61) = 32786
    assert(out(0) == ((10L, 1L, 1L, 2 * (1000000 / 61))))
    // docs 20/30: single-list rank 2 -> 1000000 DIV 62 = 16129, tie
    // broken by doc_id
    assert(out(1) == ((20L, 2L, 0L, 1000000 / 62)))
    assert(out(2) == ((30L, 0L, 2L, 1000000 / 62)))
  }

  test("fused ranking surfaces docs that either ranker alone buries") {
    // doc 5 is mid-list in BOTH rankers; doc 6 tops one, absent in the
    // other — RRF must put the consistently-good doc first
    val a = Seq((6L, 1L), (5L, 2L), (7L, 3L)).toDF("doc_id", "rank")
    val b = Seq((8L, 1L), (5L, 2L), (9L, 3L)).toDF("doc_id", "rank")
    val top = HybridSearch.rrfFuse(a, b, k = 60, topK = 1).collect()(0)
    assert(top.getLong(0) == 5L,
      s"expected consensus doc 5 first, got ${top.getLong(0)}")
  }
}
