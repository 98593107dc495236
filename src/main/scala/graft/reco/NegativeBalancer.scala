package graft.reco

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Negative sampling for implicit-feedback ranking: for each user, emit
  * the most popular items the user has NOT interacted with, up to
  * ratio × (#positives), most-popular-first.
  *
  * Reference: NegativeBalancer (src/main/scala/ws/vinta/albedo/
  * transformers/NegativeBalancer.scala:74-112): driver-collected
  * LinkedHashSet of popular items, RDD aggregateByKey positive sets,
  * `popularItems.diff(positives).slice(0, n*ratio)` per user.
  *
  * DataFrame rewrite (SURVEY.md §7.4): the popularity-ordered item list
  * is a bounded array (maxCandidates) broadcast as a literal-free
  * cross-join side; per-user positives come from `collect_set` (one
  * shuffle); `array_except` preserves first-argument order, so
  * "most-popular-first minus positives, take n·ratio" is exactly
  * `slice(array_except(popular, positives), 1, n*ratio)` — then explode.
  * No driver-side set logic, no per-row external state; works at any
  * user count since the only unbounded dimension stays row-shaped.
  */
object NegativeBalancer {

  /** @param interactions  (user_id, item_id, ...) positive rows
    * @param maxCandidates bound on the popular-item pool (driver-safe)
    * @param ratio         negatives per positive
    * @return (user_id, item_id, label=0.0) negative rows
    */
  def negatives(interactions: DataFrame, maxCandidates: Int, ratio: Double): DataFrame = {
    val popularOrdered = interactions
      .groupBy(col("item_id")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("item_id"))
      .limit(maxCandidates)
      .agg(collect_list(col("item_id")).as("popular")) // single bounded row

    val positives = interactions
      .groupBy(col("user_id"))
      .agg(collect_set(col("item_id")).as("pos_items"),
        count(lit(1)).as("n_pos"))

    positives
      .crossJoin(broadcast(popularOrdered))
      .withColumn("negs",
        slice(array_except(col("popular"), col("pos_items")),
          lit(1), greatest((col("n_pos") * ratio).cast("int"), lit(0))))
      .select(col("user_id"), explode(col("negs")).as("item_id"))
      .withColumn("label", lit(0.0))
  }

  /** Positives ∪ negatives with labels — the balanced training set
    * (reference: NegativeBalancer.scala:109-111 union). */
  def balance(interactions: DataFrame, maxCandidates: Int, ratio: Double): DataFrame = {
    val pos = interactions.select(col("user_id"), col("item_id"))
      .distinct().withColumn("label", lit(1.0))
    pos.unionByName(negatives(interactions, maxCandidates, ratio))
  }
}
