package graft.llmops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog " * 5
  private def toy = Seq(
    (1L, base),
    (2L, base),                                  // exact dup of 1
    (3L, base.replace("lazy", "sleepy")),        // near dup of 1
    (4L, "completely different content about spark catalyst optimizer rules"),
    (5L, "Another unrelated document mentioning parquet columnar storage")
  ).toDF("doc_id", "text")

  test("exact dedup marks identical docs, keeps min id as canon") {
    val out = Dedup.exact(toy, "doc_id", "text")
    val byId = out.select("doc_id", "canon_id", "is_dup")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(byId(1L) == (1L, false))
    assert(byId(2L) == (1L, true))
    assert(byId(3L)._2 == false) // near dup is NOT an exact dup
  }

  test("minhash LSH surfaces exact and near dup pairs, not unrelated") {
    val cands = Dedup.minhashCandidates(toy, "doc_id", "text",
      shingleK = 2, numHashes = 64, bands = 16, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(cands.contains((1L, 2L)))
    assert(cands.contains((1L, 3L)) || cands.contains((2L, 3L)))
    assert(!cands.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("exact jaccard: identical docs = 1.0, disjoint < 0.1") {
    val pairs = Seq((1L, 2L), (1L, 4L)).toDF("id_a", "id_b")
    val j = Dedup.exactJaccard(toy, pairs, "doc_id", "text", shingleK = 2)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(j((1L, 2L)) == 1.0)
    assert(j((1L, 4L)) < 0.1)
  }

  test("simhash: identical hash for identical text, close for near dup") {
    val sh = toy.select($"doc_id", Dedup.simhash64($"text").as("sh"))
      .as[(Long, Long)].collect().toMap
    assert(sh(1L) == sh(2L))
    val hamNear = java.lang.Long.bitCount(sh(1L) ^ sh(3L))
    val hamFar = java.lang.Long.bitCount(sh(1L) ^ sh(4L))
    assert(hamNear < hamFar)
  }

  test("simhashPairs finds the exact-dup pair via quarter blocking") {
    val pairs = Dedup.simhashPairs(toy, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("shingles: distinct k-word shingles; short text falls back whole") {
    val sh = Seq((1L, "a b c d")).toDF("id", "t")
      .select(Dedup.shingles($"t", 3).as("s")).as[Seq[String]].collect()(0)
    assert(sh == Seq("a b c", "b c d"))
    val short = Seq((1L, "a b")).toDF("id", "t")
      .select(Dedup.shingles($"t", 3).as("s")).as[Seq[String]].collect()(0)
    assert(short == Seq("a b"))
  }
}
