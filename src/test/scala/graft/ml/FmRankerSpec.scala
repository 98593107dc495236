package graft.ml

import graft.SparkSpec
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.functions._

/** Ties the q173 quantized FM score gate to the model's OWN decision
  * function (the MarginReplaySpec pattern extended to the pairwise
  * term): score_q/(2·10¹⁴) must track FMClassificationModel.predictRaw
  * on features rebuilt from the SAME sparse dump the oracle reads. A
  * transposed factor matrix, a wrong unit in the 2·10⁵/2·10⁸ scale
  * bookkeeping, or a dropped Q_f term all still hash-replay
  * consistently between engines — only this spec catches them. The
  * quantization error bound: v-truncation at 10⁻⁴ perturbs each S_f by
  * ≤ nnz·10⁻⁴ ≈ 2·10⁻³, so ½Σ(S²−Q) moves by ≲ 0.05 at the fixture's
  * |S_f| ≤ ~10; w-truncation adds ≪ 10⁻⁴. */
class FmRankerSpec extends SparkSpec {

  test("quantized FM scores track predictRaw; ranking is per-user top-k") {
    val replay = FmRanker.scoreReplay(spark).cache()
    val rows = replay.collect()
    assert(rows.nonEmpty)
    // per-user contract: rn dense 1..k, scores non-increasing
    rows.groupBy(_.getAs[Any]("user_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rn"))
      assert(sorted.map(_.getAs[Long]("rn")).toSeq ==
        (1L to sorted.length).toSeq)
      val scores = sorted.map(_.getAs[Long]("score_q")).toSeq
      assert(scores == scores.sorted.reverse, "scores not non-increasing")
      assert(sorted.length <= 5)
    }

    val m = FmRanker.fittedModel(spark)
    val sp = spark.read.parquet(s"${FmRanker.fmDir}/sparse.parquet")
    val dim = m.linear.size
    // rebuild each replayed pair's features from the dumped sparse
    // entries — exactly the bytes both engines' integer replay reads
    val wanted = rows.map(r =>
      (r.getAs[Any]("user_id"), r.getAs[Any]("repo_id"))).toSet
    val entries = sp.collect()
      .groupBy(r => (r.getAs[Any]("user_id"), r.getAs[Any]("repo_id")))
    rows.foreach { r =>
      val key = (r.getAs[Any]("user_id"), r.getAs[Any]("repo_id"))
      val es = entries(key)
      val v = Vectors.sparse(dim,
        es.map(e => e.getAs[Long]("d").toInt).toArray,
        es.map(e => e.getAs[Long]("x").toDouble / 1000.0).toArray)
      val raw = m.predictRaw(v)(1)
      val sq = r.getAs[Long]("score_q").toDouble / 2e14
      assert(math.abs(sq - raw) < 0.1,
        s"score_q/2e14=$sq vs predictRaw=$raw drifts beyond the " +
          s"quantization bound for $key")
    }
    assert(wanted.forall(entries.contains))
    replay.unpersist()
  }

  test("denseIndex equals the global-window rank and survives repartitioning") {
    // the fit path's entity index must stay byte-identical to
    // row_number() over (order by key) — q173's dump depends on it —
    // while being built without the single-task window funnel. Pin the
    // equivalence, and pin that the mapping is partitioning-invariant
    // (the scale claim: boundaries can move, ranks cannot).
    import spark.implicits._
    val keys = Seq("m", "a", "z", "a", "k", "b", "m", "q", "c").toDF("k")
    val expected = keys.select(col("k")).distinct()
      .withColumn("idx", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("k")))
        .cast("long") - 1L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    for (parts <- Seq(1, 3, 7)) {
      val got = FmRanker.denseIndex(keys.repartition(parts), "k", "idx")
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got == expected, s"denseIndex diverged at $parts partitions")
    }
  }

  test("the FM separates the fixture labels (ranking quality sanity)") {
    // train AUC from the dumped decision function — a broken feature
    // path (zeroed one-hots, mis-scaled sides) collapses toward chance.
    // fittedModel (not a bare memo probe, ADVICE r13 #2): safe when
    // this test runs in isolation or the SoftReference was GC-cleared —
    // it re-dumps and refits the seeded model instead of sys.error'ing
    val m = FmRanker.fittedModel(spark)
    val sp = spark.read.parquet(s"${FmRanker.fmDir}/sparse.parquet")
    val dim = m.linear.size
    val scored = sp.collect()
      .groupBy(r => (r.getAs[Any]("user_id"), r.getAs[Any]("repo_id")))
      .map { case (_, es) =>
        val v = Vectors.sparse(dim,
          es.map(e => e.getAs[Long]("d").toInt).toArray,
          es.map(e => e.getAs[Long]("x").toDouble / 1000.0).toArray)
        (m.predictRaw(v)(1), es.head.getAs[Double]("label"))
      }.toSeq
    val pos = scored.filter(_._2 > 0.5).map(_._1)
    val neg = scored.filter(_._2 <= 0.5).map(_._1)
    assert(pos.nonEmpty && neg.nonEmpty)
    val sortedAll = scored.map(_._1).sorted
    def rank(s: Double): Double = {
      val lo = sortedAll.count(_ < s)
      val eq = sortedAll.count(_ == s)
      lo + (eq + 1) / 2.0
    }
    val auc = (pos.map(rank).sum - pos.size.toDouble * (pos.size + 1) / 2) /
      (pos.size.toDouble * neg.size)
    assert(auc > 0.9 && auc <= 1.0, s"FM train AUC $auc outside sanity band")
  }

  test("heldOutScores (q90c): scored rows are exactly the held-out-user " +
      "bucket, scores discriminate, and no train user leaks in") {
    import org.apache.spark.sql.functions._
    val scored = FmRanker.heldOutScores(spark).cache()
    assert(scored.count() > 0)
    // the split contract: every scored row's user hashes to the
    // held-out side of the portable bucket (>= 0.8 * 1e6)
    val cut = math.round(0.8 * 1000000)
    val leaked = scored.filter(
      graft.reco.Splits.hashBucketPortable(col("user_id"), "q90c")
        < cut).count()
    assert(leaked == 0, s"$leaked train-bucket rows in the held-out scores")
    // both labels present and the margin separates them on average —
    // the metric the gate bands is measuring signal, not noise
    val m = scored.groupBy(col("label")).agg(avg(col("score")).as("s"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(m.keySet == Set(0.0, 1.0))
    assert(m(1.0) > m(0.0),
      s"held-out positives (${m(1.0)}) do not outscore negatives (${m(0.0)})")
    scored.unpersist()
  }
}
