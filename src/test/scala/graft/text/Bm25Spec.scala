package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  // 4-doc corpus with hand-checkable stats: N=4, dl = (3, 3, 2, 4), sum_dl=12
  private def corpus = Seq(
    (1L, "spark shuffle join"),
    (2L, "spark spark window"),
    (3L, "window join"),
    (4L, "sort merge join group")).toDF("doc_id", "text")

  test("bm25 matches hand computation on a tiny corpus") {
    val out = Bm25.search(corpus, "doc_id", "text", Seq("spark"), topK = 4)
      .select($"doc_id", $"score_u").as[(Long, Long)].collect().toMap
    // df(spark)=2, idf = ln((4-2+0.5)/(2+0.5)+1) = ln(2)
    val idf = math.log(2.0)
    def s(tf: Long, dl: Long): Long = {
      val v = idf * tf * 2.2 / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl * 4.0 / 12.0))
      math.round(v * 1000000.0)
    }
    assert(out == Map(1L -> s(1, 3), 2L -> s(2, 3)))
  }

  test("only docs containing a query term are returned, ranks are dense") {
    val out = Bm25.search(corpus, "doc_id", "text", Seq("join"), topK = 10)
      .orderBy($"rank").select($"doc_id", $"rank").as[(Long, Long)].collect()
    assert(out.map(_._1).toSet == Set(1L, 3L, 4L))
    assert(out.map(_._2).toSeq == Seq(1L, 2L, 3L))
    // same tf everywhere: shortest doc scores highest
    assert(out.head._1 == 3L)
  }

  test("repeated term raises tf monotonically but sublinearly") {
    val out = Bm25.search(corpus, "doc_id", "text", Seq("spark"), topK = 4)
      .select($"doc_id", $"score_u").as[(Long, Long)].collect().toMap
    assert(out(2L) > out(1L))           // tf 2 beats tf 1 at same dl
    assert(out(2L) < 2 * out(1L))       // saturation: sublinear in tf
  }
}
