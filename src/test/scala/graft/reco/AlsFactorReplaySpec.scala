package graft.reco

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Ties the q25b factor-replay gate back to the PRODUCTION recommend
  * path: the quantized-integer top-k recomputed from the dumped factor
  * tables must agree with `ALSModel.recommendForUserSubset` (MLlib's
  * blocked float GEMM) on the same model. Quantization at 10⁻⁶ is far
  * below the factor score gaps, so the two rankings should coincide on
  * nearly every user; we require ≥95% of users to have identical
  * top-5 item sets and 100% to share ≥3 of 5 (guards a transposed or
  * mis-joined factor matrix, which lands near 0 overlap).
  */
class AlsFactorReplaySpec extends SparkSpec {

  test("factor replay top-5 agrees with recommendForUserSubset") {
    val s = spark
    import s.implicits._
    val replay = graft.queries.Reco.alsFactorReplay(spark, sf0001)
      .groupBy("user_id")
      .agg(collect_set(col("item_id")).as("replay_items"))
    val model = graft.ml.ModelMemo.cached(spark, "als-q25b:albedo") {
      AlsRecommender.train(
        graft.fixtures.AlbedoFixtures.starringsP(spark)
          .select(col("user_id"), col("repo_id").as("item_id"),
            col("starring").as("rating")),
        rank = 8, regParam = 0.1, alpha = 10, maxIter = 5, seed = 42)
    }
    val users = replay.select(col("user_id"))
    val prod = model.recommendForUsers(users, 5)
      .groupBy("user_id")
      .agg(collect_set(col("item_id")).as("prod_items"))
    val overlap = replay.join(prod, "user_id")
      .select(col("user_id"),
        size(array_intersect(col("replay_items"), col("prod_items")))
          .as("n_common"))
      .collect()
    assert(overlap.nonEmpty)
    val nUsers = overlap.length
    val exact = overlap.count(_.getInt(1) == 5)
    assert(overlap.forall(_.getInt(1) >= 3),
      s"some user shares <3 of 5 items with the production path")
    assert(exact >= (nUsers * 0.95).toInt,
      s"only $exact/$nUsers users have identical top-5 sets")
  }
}
