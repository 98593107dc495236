package graft.ml

import graft.reco.RankingEvaluator
import org.apache.spark.ml.evaluation.Evaluator
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

/** NDCG@k as a Spark ML `Evaluator`, so ranking models ride the stock
  * `CrossValidator`/`TrainValidationSplit` machinery.
  *
  * Reference: evaluators/RankingEvaluator.scala:14-108 — an Evaluator
  * over a precomputed per-user actual-items frame, fed by
  * RankingMetricFormatter's (user, item, prediction) output. Same
  * contract here: `evaluate` ranks the scored rows per user by
  * prediction and computes mean NDCG@k against `actual` (computed once,
  * outside the CV loop, exactly like the reference's
  * loadUserActualItemsDF).
  *
  * Scale: delegates to graft.reco.RankingEvaluator — row-shaped,
  * one shuffle keyed by user — and collects a single scalar.
  */
final class NdcgEvaluator(override val uid: String,
    actual: Dataset[_], k: Int) extends Evaluator {

  def this(actual: Dataset[_], k: Int) =
    this(Identifiable.randomUID("ndcgEval"), actual, k)

  override def evaluate(dataset: Dataset[_]): Double = {
    val predicted = dataset.select(
      col("user_id"), col("item_id"),
      col("prediction").cast("double").as("score"))
    RankingEvaluator.evaluate(predicted,
        actual.toDF().select(col("user_id"), col("item_id")), k)
      .select(col("ndcg")).head().getDouble(0)
  }

  override def isLargerBetter: Boolean = true

  override def copy(extra: ParamMap): NdcgEvaluator =
    new NdcgEvaluator(uid, actual, k)
}
