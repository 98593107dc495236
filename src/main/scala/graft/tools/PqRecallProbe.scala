package graft.tools

import graft.llmops.{ProductQuantization => PQ, Similarity}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: PQ / IVF-PQ recall@5 against the exact integer-L2 top-5
  * on the embeddings fixture (VERDICT r8 "Next round" #5 — "a recall
  * floor of 0.15 would pass a barely-working quantizer"). Sweeps
  * (m, k) for global ADC and nProbe at the gate operating point; the
  * measured curve lands in SCALE.md §r9 and PqSpec pins its band at
  * the operating point's observed value.
  * Usage: runMain graft.tools.PqRecallProbe [sfDir] [nQueries]
  *
  * r10: pass `clustered` as the first arg for the PLANTED-CLUSTER
  * fixture (50 centers × 10 points, within-cluster cos ≈ 0.95 — the
  * real-corpus regime where near-dup neighbors actually live, per the
  * SCALE.md r9 note). The uniform fixture stays the honest worst
  * case; this leg records what a user should expect on structured
  * data.
  */
object PqRecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val nq = args.lift(1).map(_.toInt).getOrElse(32)
    val iters = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dim = 64
    val emb = (if (dir == "clustered")
      graft.fixtures.ScaleCorpus.plantedClusters(spark)
    else Tables.embeddings(spark, dir)).cache()
    val qPred = col("vec_id") < nq

    // exact quantized-L2 top-5 (ground truth; independent of m — the
    // per-subspace squared sums total the full-vector distance)
    val sv = PQ.subvectors(emb, 8, dim)
    val exactTop = {
      val d = sv.select(col("id").as("query_id"), col("sub"), col("qv"))
        .filter(col("query_id") < nq)
        .join(sv.select(col("id").as("neighbor_id"), col("sub"),
          col("qv").as("nv")), Seq("sub"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("dd", aggregate(
          zip_with(col("qv"), col("nv"), (x, y) => (x - y) * (x - y)),
          lit(0L), (s, t) => s + t))
        .groupBy(col("query_id"), col("neighbor_id"))
        .agg(sum(col("dd")).as("l2"))
      d.withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("query_id"))
            .orderBy(col("l2"), col("neighbor_id"))))
        .filter(col("rn") <= 5)
        .select(col("query_id"), col("neighbor_id"))
        .cache()
    }
    val denom = exactTop.count().toDouble

    def recall(top: DataFrame): Double =
      exactTop.join(top.select(col("query_id"), col("neighbor_id"))
          .withColumn("hit", lit(1)),
        Seq("query_id", "neighbor_id"), "left")
        .agg(sum(coalesce(col("hit"), lit(0))))
        .head().getLong(0) / denom

    println(f"[pq] fixture=$dir queries=$nq ground-truth pairs=${denom}%.0f")
    for ((m, k) <- Seq((4, 16), (8, 16), (8, 32), (8, 64), (16, 16))) {
      val cents = PQ.train(emb, m, dim, k, iters)
      import spark.implicits._
      val centDf = cents.toDF()
      val adcTop = PQ.adcTopK(emb, centDf, k = 5, m, dim, qPred)
      val r = recall(adcTop)
      println(f"[pq] ADC      m=$m%2d k=$k%2d            recall@5=$r%.3f")
      if (dir == "clustered") {
        // the near-dup question itself: are the retrieved top-5 the
        // query's CLUSTER-MATES? (recall@5 vs exact L2 punishes
        // within-cluster ordering noise the user never sees)
        val lbl = emb.select(col("vec_id"), col("label"))
        val mate = adcTop
          .join(lbl.select(col("vec_id").as("query_id"),
            col("label").as("ql")), Seq("query_id"))
          .join(lbl.select(col("vec_id").as("neighbor_id"),
            col("label").as("nl")), Seq("neighbor_id"))
          .agg(avg((col("ql") === col("nl")).cast("double")))
          .head().getDouble(0)
        println(f"[pq] ADC      m=$m%2d k=$k%2d   cluster-mate@5=$mate%.3f")
      }
      if (m == 8 && k == 16) {
        for (nProbe <- Seq(1, 2, 4, 8)) {
          val ri = recall(Similarity.ivfPqTopKPortable(
            emb, centDf, k = 5, m, dim, nProbe, qPred))
          println(f"[pq] IVF-PQ   m=$m%2d k=$k%2d nProbe=$nProbe%2d  recall@5=$ri%.3f")
        }
      }
    }
    spark.stop()
  }
}
