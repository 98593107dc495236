package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("aggregator top-k equals window top-k on fixture data") {
    val scored = graft.reco.Interactions.fromEvents(spark, sf0001)
      .select($"user_id", $"item_id", $"value".as("score"))
      .repartition(7) // exercise partial-merge across partitions
    val viaW = TopK.viaWindow(scored, "user_id", "item_id", "score", 3)
      .as[(Int, Int, Double, Long)].collect().toSet
      .map((t: (Int, Int, Double, Long)) => (t._1.toLong, t._2.toLong, t._3, t._4))
    val viaA = TopK.viaAggregator(scored, "user_id", "item_id", "score", 3)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(viaA == viaW)
  }

  test("ties broken by item id in both strategies") {
    val df = Seq((1L, 10L, 5.0), (1L, 7L, 5.0), (1L, 3L, 5.0))
      .toDF("k", "item", "score")
    val w = TopK.viaWindow(df, "k", "item", "score", 2)
      .select("item").as[Long].collect().toSeq
    val a = TopK.viaAggregator(df, "k", "item", "score", 2)
      .select("item").as[Long].collect().toSeq
    assert(w == Seq(3L, 7L))
    assert(a == Seq(3L, 7L))
  }
}
