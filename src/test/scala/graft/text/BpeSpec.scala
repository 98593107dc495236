package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE merge training: hand-computed merge chains on the classic
  * Sennrich-style fixture, greedy-overlap semantics on repeat chains,
  * and determinism. */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  // low×5, lower×2, newest×6, widest×3 — the ACL'16 walkthrough shape.
  private def sennrichDocs = Seq(
    "low low low low low",
    "lower lower",
    "newest newest newest newest newest newest",
    "widest widest widest").toDF("text")

  test("first five merges match the hand-computed argmax chain") {
    val (merges, _) = Bpe.train(sennrichDocs, "text", maxWords = 100, rounds = 5)
    val got = merges.orderBy("merge_rank")
      .select("merge_rank", "left_sym", "right_sym", "pair_count")
      .as[(Int, String, String, Long)].collect().toSeq
    // (e,s)=9 wins its 3-way tie on left symbol; (es,t)=9 likewise;
    // then (est,</w>)=9, (l,o)=7 over (o,w) on left, (lo,w)=7.
    assert(got == Seq(
      (1, "e", "s", 9L),
      (2, "es", "t", 9L),
      (3, "est", "</w>", 9L),
      (4, "l", "o", 7L),
      (5, "lo", "w", 7L)))
  }

  test("segmentations after five merges are the hand-derived ones") {
    val (_, words) = Bpe.train(sennrichDocs, "text", maxWords = 100, rounds = 5)
    val seg = words
      .select(col("word"), array_join(col("syms"), " ").as("s"))
      .as[(String, String)].collect().toMap
    assert(seg("newest") == "n e w est</w>")
    assert(seg("widest") == "w i d est</w>")
    assert(seg("low") == "low </w>")
    assert(seg("lower") == "low e r </w>")
  }

  test("overlap chains merge greedily left-to-right (run parity)") {
    val docs = Seq("aaaa aaaa", "aaa").toDF("text")
    // aaaa: (a,a)×3 ×2 copies + aaa: (a,a)×2 → best (a,a)=8.
    val (m1, w1) = Bpe.train(docs, "text", maxWords = 10, rounds = 1)
    assert(m1.select("left_sym", "right_sym", "pair_count")
      .as[(String, String, Long)].head() == ("a", "a", 8L))
    val seg = w1.select(col("word"), array_join(col("syms"), " ").as("s"))
      .as[(String, String)].collect().toMap
    assert(seg("aaaa") == "aa aa </w>") // greedy: positions 0,2 — never 1
    assert(seg("aaa") == "aa a </w>")   // odd chain leaves the tail single
  }

  test("training is deterministic across runs and partitionings") {
    val a = Bpe.train(sennrichDocs.repartition(7), "text", 100, 4)._1
      .orderBy("merge_rank").collect().toSeq
    val b = Bpe.train(sennrichDocs.coalesce(1), "text", 4, 4)._1
      .orderBy("merge_rank").collect().toSeq
    assert(a == b)
  }

  test("word table filters non-alpha tokens and respects the cap") {
    val docs = Seq("the the the 42 x1 -- a b").toDF("text")
    val wt = Bpe.wordTable(docs, "text", maxWords = 2)
      .as[(String, Long)].collect().toSeq
    assert(wt == Seq(("the", 3L), ("a", 1L))) // cap=2, ties break on word
  }
}
