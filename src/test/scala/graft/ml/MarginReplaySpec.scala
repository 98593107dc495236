package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Ties the q44b quantized-margin gate to the model's OWN decision
  * function: margin_q/10⁹ must sit within the coef-truncation bound of
  * the LogisticRegressionModel's rawPrediction on the same rows. The
  * truncation error is < Σ|f_j|·10⁻⁶ + |intercept|·10⁻⁶·slack ≈ 10⁻²
  * at fixture feature magnitudes, so a mis-ordered feature list, a
  * transposed coefficient vector, or a wrong intercept term (all of
  * which still hash-replay consistently!) fails this spec loudly. */
class MarginReplaySpec extends SparkSpec {

  test("quantized margins track the model rawPrediction within bound") {
    val replay = AlbedoRanker.marginReplay(spark)
      .select(col("user_id"), col("repo_id"), col("margin_q"))
    val lrm = ModelMemo.cached(spark, "lr-q44b-margin")(
      sys.error("model must already be memoized by marginReplay")
        : org.apache.spark.ml.classification.LogisticRegressionModel)
    val f = spark.read.parquet(s"${AlbedoRanker.marginDir}/frame.parquet")
    val assembled = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(AlbedoRanker.marginFeatureCols.toArray)
      .setOutputCol("features")
      .transform(AlbedoRanker.marginFeatureCols.foldLeft(f) {
        (df, c) => df.withColumn(c, col(c).cast("double"))
      })
    val scored = lrm.transform(assembled)
      .select(col("user_id"), col("repo_id"),
        col("rawPrediction").as("raw"))
    val rows = replay.join(scored, Seq("user_id", "repo_id")).collect()
    assert(rows.length == 200)
    rows.foreach { r =>
      val mq = r.getAs[Long]("margin_q").toDouble / 1e9
      val raw = r.getAs[org.apache.spark.ml.linalg.Vector]("raw")(1)
      assert(math.abs(mq - raw) < 0.05,
        s"margin_q/1e9=$mq vs rawPrediction=$raw drifts beyond bound")
    }
  }
}
