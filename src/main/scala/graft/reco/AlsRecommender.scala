package graft.reco

import org.apache.spark.ml.recommendation.{ALS, ALSModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ALS collaborative-filtering candidate generation.
  *
  * Reference: ALSRecommenderBuilder (src/main/scala/ws/vinta/albedo/
  * ALSRecommenderBuilder.scala:45-59) — implicitPrefs, rank=50,
  * regParam=0.5, alpha=40, maxIter=26, seed=42, coldStartStrategy=drop —
  * and ALSRecommender's hand-rolled blocked GEMM + bounded priority
  * queue top-k (recommenders/ALSRecommender.scala:21-61).
  *
  * Our engine delegates the recommend step to
  * `ALSModel.recommendForUserSubset`, which runs the same blocked
  * dot-product internally (SURVEY.md §2.3 #27) — no custom BPQ needed.
  * Scale: factor matrices are (n_users+n_items)×rank, partitioned by id
  * block; training shuffles factor blocks per iteration (inherent to
  * ALS); recommend is a blocked cross-join with early top-k, never a
  * row-per-score shuffle.
  */
final class AlsRecommender(model: ALSModel) extends Recommender {
  override val name = "als"

  /** Underlying MLWritable model (persistence — SURVEY.md §2.1 #9). */
  def modelRef: ALSModel = model

  override def recommendForUsers(users: DataFrame, topK: Int): DataFrame = {
    val recs = model.recommendForUserSubset(users.select(col("user_id")), topK)
    recs.select(col("user_id"),
        explode(col("recommendations")).as("rec"))
      .select(col("user_id"),
        col("rec.item_id").as("item_id"),
        col("rec.rating").cast("double").as("score"))
      .withColumn("source", lit(name))
  }
}

object AlsRecommender {

  /** Train with the reference's hyperparameters (scaled-down rank/iters
    * are caller's choice; defaults mirror ALSRecommenderBuilder.scala:45-59). */
  def train(ratings: DataFrame, rank: Int = 50, regParam: Double = 0.5,
      alpha: Double = 40, maxIter: Int = 26, seed: Long = 42): AlsRecommender = {
    val als = new ALS()
      .setImplicitPrefs(true)
      .setRank(rank)
      .setRegParam(regParam)
      .setAlpha(alpha)
      .setMaxIter(maxIter)
      .setSeed(seed)
      .setColdStartStrategy("drop")
      .setUserCol("user_id")
      .setItemCol("item_id")
      .setRatingCol("rating")
    new AlsRecommender(als.fit(ratings))
  }
}
