package graft.reco

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Item-based collaborative filtering, fully declarative.
  *
  * Reference: the legacy sklearn item-CF path (reference:
  * app/management/commands/train_item_cf.py:31-46 — cosine similarity
  * over the binary user×item matrix) re-expressed as the classic
  * co-occurrence formulation:
  *   sim(a,b) = |U_a ∩ U_b| / √(|U_a|·|U_b|)
  * computed by a self-join on user_id (never a dense matrix), then
  *   score(u,c) = Σ_{i ∈ items(u)} sim(i,c)
  * as a join-aggregate. Every step is key-partitioned; the item-item
  * similarity table is O(item² ∩ observed) and is the only quadratic
  * object — at 100 TB you cap per-user items upstream (power-law guard,
  * same bound as SURVEY §7.4 notes for co-occurrence).
  */
object ItemCF {

  /** Deterministic per-user item cap: keep each user's `cap` smallest
    * item_ids. Bounds the co-occurrence self-join at Σ_u min(d_u, cap)²
    * — one power-law user can no longer make the join quadratic. */
  def capPerUser(ui: DataFrame, cap: Int): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("item_id"))
    ui.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap).drop("__rn")
  }

  /** Cosine item-item similarity from distinct (user,item) pairs.
    * @param maxItemsPerUser power-law guard on the user-keyed self-join
    *        (SURVEY §7.4): users above the cap contribute only their
    *        first `cap` items (by item_id — deterministic, mirrored in
    *        the q51 oracle). Popularity (the cosine denominator) is
    *        still computed over ALL pairs so sim stays unbiased for
    *        uncapped users. */
  def itemSimilarity(interactions: DataFrame,
      maxItemsPerUser: Int = 1000): DataFrame = {
    val uiAll = interactions.select(col("user_id"), col("item_id")).distinct()
    val ui = capPerUser(uiAll, maxItemsPerUser)
    val pop = uiAll.groupBy(col("item_id")).agg(count(lit(1)).as("pop"))
    val a = ui.select(col("user_id"), col("item_id").as("item_a"))
    val b = ui.select(col("user_id"), col("item_id").as("item_b"))
    a.join(b, Seq("user_id"))
      .filter(col("item_a") =!= col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("cooc"))
      .join(broadcast(pop.select(col("item_id").as("item_a"), col("pop").as("pop_a"))), Seq("item_a"))
      .join(broadcast(pop.select(col("item_id").as("item_b"), col("pop").as("pop_b"))), Seq("item_b"))
      .withColumn("sim", col("cooc") / sqrt(col("pop_a") * col("pop_b")))
      .select(col("item_a"), col("item_b"), col("sim"))
  }

  /** Top-k recommendations per user: sum of similarities from the
    * user's items to unseen candidates. */
  def recommend(interactions: DataFrame, users: DataFrame, k: Int,
      maxItemsPerUser: Int = 1000): DataFrame = {
    val ui = interactions.select(col("user_id"), col("item_id")).distinct()
      .join(users.select(col("user_id")), Seq("user_id"))
    val sims = itemSimilarity(interactions, maxItemsPerUser)
    val scored = ui.join(sims, ui("item_id") === sims("item_a"))
      .groupBy(col("user_id"), col("item_b").as("candidate"))
      .agg(round(sum(col("sim")), 9).as("score"))
    // drop candidates the user already has (anti join on seen pairs)
    val unseen = scored.join(
      ui.select(col("user_id"), col("item_id").as("candidate")),
      Seq("user_id", "candidate"), "left_anti")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("score").desc, col("candidate"))
    unseen.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("user_id"), col("candidate"), col("score"), col("rn"))
  }
}
