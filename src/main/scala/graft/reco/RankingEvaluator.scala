package graft.reco

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking-quality metrics: NDCG@k, Precision@k, MAP@k.
  *
  * Reference: RankingEvaluator (src/main/scala/ws/vinta/albedo/
  * evaluators/RankingEvaluator.scala:14-108), which collects per-user
  * item lists and feeds `mllib.RankingMetrics`. Formulas follow the
  * published RankingMetrics semantics (binary relevance):
  *   DCG@k  = Σ_{i∈hits, pos_i≤k} 1/log2(pos_i+1)   (1-based pos)
  *   IDCG@k = Σ_{i=1..min(k,|actual|)} 1/log2(i+1)
  *   P@k    = |hits ∩ top-k| / k
  *   AP@k   = (Σ_{hit at pos p} precision@p) / min(k, |actual|)
  *
  * Scale design vs the reference: no RDD hop, no collect_list of
  * unbounded arrays — everything stays row-shaped through one shuffle
  * keyed by user_id; per-user scalars then average in a final partial
  * agg. Works unchanged whether there are 10^2 or 10^9 users.
  */
object RankingEvaluator {

  /** @param predicted (user_id, item_id, score) candidate rows
    * @param actual    (user_id, item_id) ground-truth rows
    * @return single row: (k, n_users, ndcg, precision, map)
    */
  def evaluate(predicted: DataFrame, actual: DataFrame, k: Int): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("score").desc, col("item_id"))

    // deterministic top-k ranking per user (row_number; SURVEY §7.4)
    val ranked = predicted
      .select(col("user_id"), col("item_id"), col("score"))
      .withColumn("pos", row_number().over(byUser))
      .filter(col("pos") <= k)

    val actualSets = actual
      .select(col("user_id"), col("item_id")).distinct()
    val nActual = actualSets.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_actual"))

    // hits with their predicted position
    val hits = ranked.join(actualSets, Seq("user_id", "item_id"))
    val hitsW = Window.partitionBy(col("user_id")).orderBy(col("pos"))
    val perUserHit = hits
      .withColumn("hit_idx", row_number().over(hitsW)) // #hits up to this pos
      .groupBy(col("user_id"))
      .agg(
        sum(lit(1.0) / log2(col("pos") + 1)).as("dcg"),
        count(lit(1)).as("n_hits"),
        sum(col("hit_idx") / col("pos")).as("ap_num"))

    // IDCG from n_actual: sum_{i=1..min(k,n)} 1/log2(i+1), computed by
    // expanding a bounded (≤k) sequence — no driver loop.
    val perUser = nActual
      .join(perUserHit, Seq("user_id"), "left")
      .na.fill(0.0, Seq("dcg", "ap_num")).na.fill(0L, Seq("n_hits"))
      .withColumn("m", least(col("n_actual"), lit(k)))
      .withColumn("idcg", expr("aggregate(sequence(1, m), 0D, (acc, i) -> acc + 1.0 / log2(i + 1))"))
      .withColumn("ndcg_u", when(col("idcg") > 0, col("dcg") / col("idcg")).otherwise(0.0))
      .withColumn("prec_u", col("n_hits") / lit(k.toDouble))
      .withColumn("ap_u", when(col("m") > 0, col("ap_num") / col("m")).otherwise(0.0))

    perUser.agg(
      lit(k).as("k"),
      count(lit(1)).as("n_users"),
      avg(col("ndcg_u")).as("ndcg"),
      avg(col("prec_u")).as("precision"),
      avg(col("ap_u")).as("map"))
  }

  private def log2(c: org.apache.spark.sql.Column) = log(2.0, c)
}
