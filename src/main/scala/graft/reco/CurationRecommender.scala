package graft.reco

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Curated-lists candidate generation: items interacted with by a fixed
  * set of curator users, scored by recency of the curators' latest
  * interaction.
  *
  * Reference: CurationRecommender (src/main/scala/ws/vinta/albedo/
  * recommenders/CurationRecommender.scala:24-40): filter starring to 5
  * curator ids, `max(starred_at)` per repo, epoch-seconds score,
  * cross-join to users.
  *
  * Scale design: the curator filter reduces to a tiny table before any
  * wide op; the per-item max is a cheap agg over that slice; the k-row
  * result is broadcast for the fan-out. The `isin` curator predicate is
  * pushed into the scan.
  */
final class CurationRecommender(interactions: DataFrame, curators: Seq[Int])
    extends Recommender {
  override val name = "curation"

  def curatedItems(topK: Int): DataFrame =
    interactions
      .filter(col("user_id").isin(curators: _*))
      .groupBy(col("item_id"))
      .agg(max(col("ts_ns")).as("latest_ns"))
      // reference score: epoch seconds / 1e9 (CurationRecommender.scala:34-36)
      .withColumn("score", round(col("latest_ns") / lit(1e18), 9))
      .orderBy(col("score").desc, col("item_id"))
      .limit(topK)

  override def recommendForUsers(users: DataFrame, topK: Int): DataFrame =
    users.select(col("user_id"))
      .crossJoin(broadcast(curatedItems(topK).select(col("item_id"), col("score"))))
      .withColumn("source", lit(name))
}
