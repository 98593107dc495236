package graft.sources

import graft.SparkSpec
import graft.reco.Splits
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SnapshotsSplitsSpec extends SparkSpec {
  import spark.implicits._

  test("snapshot memoization: computes once, reads after") {
    val base = Files.createTempDirectory("snap").toString
    var computed = 0
    def make = { computed += 1; Seq((1, "a"), (2, "b")).toDF("id", "v") }
    val a = Snapshots.loadOrCreate(spark, base, "2026-08-12", "t")(make)
    val b = Snapshots.loadOrCreate(spark, base, "2026-08-12", "t")(make)
    assert(computed == 1)
    assert(a.collect().toSet == b.collect().toSet)
    // different snapshot date → recompute
    Snapshots.loadOrCreate(spark, base, "2026-08-13", "t")(make)
    assert(computed == 2)
  }

  test("model persistence round-trip (ALS)") {
    val dir = Files.createTempDirectory("alsmodel").toString + "/m"
    val ratings = graft.reco.Interactions.ratings(spark, sf0001)
    var fits = 0
    def fit = {
      fits += 1
      graft.reco.AlsRecommender.train(ratings, rank = 4, regParam = 0.1,
        alpha = 10, maxIter = 2, seed = 42).modelRef
    }
    val m1 = Snapshots.loadOrCreateModel(dir,
      org.apache.spark.ml.recommendation.ALSModel.load)(fit)
    val m2 = Snapshots.loadOrCreateModel(dir,
      org.apache.spark.ml.recommendation.ALSModel.load)(fit)
    assert(fits == 1)
    assert(m2.rank == m1.rank)
  }

  test("stratified split: fractions ≈ target, test = complement") {
    val inter = graft.reco.Interactions.fromEvents(spark, sf0001).cache()
    val (train, test) = Splits.byUser(inter, "user_id", 0.8, seed = 42)
    val n = inter.count(); val nTrain = train.count(); val nTest = test.count()
    assert(nTrain + nTest == n)
    assert(math.abs(nTrain.toDouble / n - 0.8) < 0.1)
  }

  test("portable split: exact complement, deterministic, ~frac per user") {
    val inter = graft.reco.Interactions.fromEvents(spark, sf0001).cache()
    val (tr, te) = Splits.byUserPortable(inter, "item_id", 0.8, "s90")
    val n = inter.count()
    assert(tr.count() + te.count() == n)
    assert(tr.intersect(te).count() == 0, "sides must be disjoint")
    // same assignment on a different physical layout
    val (tr2, _) = Splits.byUserPortable(inter.repartition(13),
      "item_id", 0.8, "s90")
    assert(tr.select("user_id", "item_id").except(
      tr2.select("user_id", "item_id")).count() == 0)
    assert(math.abs(tr.count().toDouble / n - 0.8) < 0.1)
  }

  test("hash split: deterministic and partitioning-independent") {
    val inter = graft.reco.Interactions.fromEvents(spark, sf0001)
    val (t1, _) = Splits.byRowHash(inter, Seq("user_id", "item_id", "ts_ns"), 0.8)
    val (t2, _) = Splits.byRowHash(inter.repartition(13),
      Seq("user_id", "item_id", "ts_ns"), 0.8)
    assert(t1.count() == t2.count())
    val s1 = t1.select("user_id", "item_id", "ts_ns").as[(Int, Int, Long)]
      .collect().toSet
    val s2 = t2.select("user_id", "item_id", "ts_ns").as[(Int, Int, Long)]
      .collect().toSet
    assert(s1 == s2)
  }

  test("mergeUpsert: highest version wins, update side wins ties") {
    val base = Seq((1, 1, "a"), (2, 1, "b"), (3, 2, "c"))
      .toDF("k", "version", "v")
    val upd = Seq((2, 2, "b2"), (3, 2, "c2"), (4, 1, "d"))
      .toDF("k", "version", "v")
    val out = Snapshots.mergeUpsert(base, upd, "k", "version")
      .orderBy("k").as[(Int, Int, String)].collect().toSeq
    // k=2: update has higher version; k=3: tie → update side; k=4: insert
    assert(out == Seq((1, 1, "a"), (2, 2, "b2"), (3, 2, "c2"), (4, 1, "d")))
  }
}
