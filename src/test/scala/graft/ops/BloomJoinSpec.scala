package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {

  import spark.implicits._

  test("pruned join is row-identical to the plain join (no false negatives)") {
    val fact = (1L to 1000L).map(i => (i % 137, i)).toDF("k", "payload")
    val dim = Seq(3L, 17L, 42L, 99L, 136L).map(k => (k, s"d$k")).toDF("dk", "name")
    val plain = fact.join(dim, fact("k") === dim("dk"))
      .select($"k", $"payload", $"name")
      .as[(Long, Long, String)].collect().toSet
    val pruned = BloomJoin.prunedJoin(fact, dim, "k", "dk")
      .select($"k", $"payload", $"name")
      .as[(Long, Long, String)].collect().toSet
    assert(pruned == plain)
    assert(plain.nonEmpty)
  }

  test("pruning actually drops non-matching fact rows") {
    val fact = (1L to 1000L).map(i => (i, i)).toDF("k", "payload")
    val dim = Seq(1L, 2L, 3L).toDF("dk")
    val kept = BloomJoin.bloomPrune(fact, dim, "k", "dk").count()
    // 3 true keys + fp; with m=65536, k=3 the fp rate is ~0 here
    assert(kept >= 3 && kept < 100, s"kept $kept of 1000")
  }

  test("empty dim side prunes everything") {
    val fact = (1L to 50L).map(i => (i, i)).toDF("k", "payload")
    val dim = Seq.empty[Long].toDF("dk")
    assert(BloomJoin.bloomPrune(fact, dim, "k", "dk").isEmpty)
  }

  test("phase 1 adds no shuffle: the membership test is map-side") {
    val fact = (1L to 50L).map(i => (i, i)).toDF("k", "payload")
    val dim = Seq(1L, 2L).toDF("dk")
    val plan = BloomJoin.bloomPrune(fact, dim, "k", "dk")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle, plan:\n$plan")
  }

  test("NULL dim keys are ignored, not a driver NPE (ADVICE r8 #1)") {
    val fact = (1L to 50L).map(i => (i, i)).toDF("k", "payload")
    val dim = Seq(Some(1L), None, Some(2L)).toDF("dk")
    val kept = BloomJoin.bloomPrune(fact, dim, "k", "dk")
      .select($"k").as[Long].collect().toSet
    // a NULL key never equi-joins, so the image behaves as if it were absent
    assert(kept.contains(1L) && kept.contains(2L) && kept.size < 10)
  }
}
