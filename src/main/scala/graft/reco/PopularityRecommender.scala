package graft.reco

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Most-popular-items candidate generation.
  *
  * Reference: PopularityRecommender (src/main/scala/ws/vinta/albedo/
  * recommenders/PopularityRecommender.scala:22-34) — top-k popular rows,
  * cross-joined against every user, scored
  * round(log10(stars)*1000)/1000 (+ recency term, :26-30).
  *
  * Scale design: popularity is an aggregation over the full interaction
  * table (shuffle on item_id — unavoidable, but partial aggregation
  * makes it map-side cheap), then `limit(k)` leaves a k-row table that
  * is explicitly `broadcast()` for the cross join — no shuffle of the
  * user side at any scale.
  */
final class PopularityRecommender(interactions: DataFrame) extends Recommender {
  override val name = "popularity"

  /** k most popular items with the reference's log-score. */
  def popularItems(topK: Int): DataFrame =
    interactions
      .groupBy(col("item_id"))
      .agg(count(lit(1)).as("cnt"), max(col("ts_ns")).as("last_seen"))
      .withColumn("score", round(log10(col("cnt")) * 1000) / 1000)
      .orderBy(col("score").desc, col("item_id"))
      .limit(topK)

  override def recommendForUsers(users: DataFrame, topK: Int): DataFrame =
    users.select(col("user_id"))
      .crossJoin(broadcast(popularItems(topK).select(col("item_id"), col("score"))))
      .withColumn("source", lit(name))
}
