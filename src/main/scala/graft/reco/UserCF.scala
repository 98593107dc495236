package graft.reco

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-based collaborative filtering with Dice similarity, fully
  * declarative.
  *
  * Reference: the legacy sklearn user-CF path (reference:
  * app/management/commands/train_user_cf.py:31-45 — `pairwise_distances
  * (user_item_matrix, metric='dice')` over the binary user×item matrix,
  * then `S·M` row-normalized predictions). A dense n_users² similarity
  * matrix cannot exist at 100 TB; the same math re-expressed on the
  * sparse observed pairs:
  *
  *   dice(u,v) = 2·|I_u ∩ I_v| / (|I_u| + |I_v|)
  *
  * computed by a self-join on item_id (the mirror of [[ItemCF]]'s
  * user-keyed join), then neighborhood-truncated weighted item
  * transfer:
  *
  *   score(u,c) = Σ_{v ∈ topN(u), c ∈ I_v} dice(u,v)
  *
  * The reference's full S·M product keeps every user as a "neighbor";
  * truncating to the top-N neighbors is the standard sparse user-CF
  * formulation (and the only one whose intermediate is bounded by
  * n_users·N rather than n_users²). Every step is key-partitioned:
  * the pair join shuffles on item_id, the transfer on v, the top-k on
  * u. The only quadratic object is Σ_i min(pop_i, cap)² — one viral
  * item cannot make the join quadratic (same power-law guard as
  * ItemCF.capPerUser, transposed).
  */
object UserCF {

  /** Deterministic per-item user cap: keep each item's `cap` smallest
    * user_ids. Bounds the co-rating self-join at Σ_i min(pop_i, cap)². */
  def capPerItem(ui: DataFrame, cap: Int): DataFrame = {
    val w = Window.partitionBy(col("item_id")).orderBy(col("user_id"))
    ui.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap).drop("__rn")
  }

  /** Dice user-user similarity from distinct (user,item) pairs.
    * @param maxUsersPerItem power-law guard on the item-keyed self-join:
    *        items above the cap contribute only their first `cap` users
    *        (by user_id — deterministic, mirrored in the q109 oracle).
    *        Degrees (the dice denominator) are still computed over ALL
    *        pairs so sim stays unbiased for users of uncapped items.
    * @param targets when only some users' neighborhoods are needed,
    *        restrict the LEFT side of the pair join to them BEFORE the
    *        join — the right side stays full so neighbors are unbiased.
    *        Filtering after the join computes every user-pair first
    *        (quiet r8 bench: 17.3 s at sf0.1 for 20 targets); since the
    *        filter commutes with the join this is plan-only, identical
    *        rows. */
  def userSimilarity(interactions: DataFrame,
      maxUsersPerItem: Int = 1000,
      targets: Option[DataFrame] = None): DataFrame =
    simsFromDistinct(
      interactions.select(col("user_id"), col("item_id")).distinct(),
      maxUsersPerItem, targets)

  /** Core over an ALREADY-DEDUPED (user_id, item_id) frame, so callers
    * that need the deduped pairs for other joins (recommend) pay the
    * distinct shuffle once. The deg joins carry one row per user —
    * deliberately NOT broadcast-hinted (O(U) rows would be collected
    * to the driver at scale); they shuffle on the key like everything
    * else, and AQE still picks broadcast when deg is actually small. */
  private def simsFromDistinct(uiAll: DataFrame,
      maxUsersPerItem: Int,
      targets: Option[DataFrame]): DataFrame = {
    val ui = capPerItem(uiAll, maxUsersPerItem)
    val deg = uiAll.groupBy(col("user_id")).agg(count(lit(1)).as("deg"))
    val a0 = ui.select(col("item_id"), col("user_id").as("u"))
    val a = targets.map(t =>
      a0.join(broadcast(t.select(col("user_id").as("u"))), Seq("u"))).getOrElse(a0)
    val b = ui.select(col("item_id"), col("user_id").as("v"))
    a.join(b, Seq("item_id"))
      .filter(col("u") =!= col("v"))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("shared"))
      .join(deg.select(col("user_id").as("u"), col("deg").as("deg_u")), Seq("u"))
      .join(deg.select(col("user_id").as("v"), col("deg").as("deg_v")), Seq("v"))
      .withColumn("sim", lit(2.0) * col("shared") / (col("deg_u") + col("deg_v")))
      .select(col("u"), col("v"), col("sim"))
  }

  /** Top-k recommendations per user: each target user's `topNeighbors`
    * most-similar users vote their items in, weighted by dice; seen
    * items excluded. */
  def recommend(interactions: DataFrame, users: DataFrame, k: Int,
      topNeighbors: Int = 10, maxUsersPerItem: Int = 1000): DataFrame = {
    val ui = interactions.select(col("user_id"), col("item_id")).distinct()
    val targets = users.select(col("user_id"))
    // one distinct for the whole plan: similarity, transfer, and the
    // seen-items anti-join all reuse `ui`'s exchange
    val sims = simsFromDistinct(ui, maxUsersPerItem, Some(targets))
    val wN = Window.partitionBy(col("u"))
      .orderBy(col("sim").desc, col("v"))
    val nbrs = sims.withColumn("__rn", row_number().over(wN))
      .filter(col("__rn") <= topNeighbors).drop("__rn")
    val scored = nbrs
      .join(ui.select(col("user_id").as("v"), col("item_id").as("candidate")),
        Seq("v"))
      .groupBy(col("u").as("user_id"), col("candidate"))
      .agg(round(sum(col("sim")), 9).as("score"))
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
