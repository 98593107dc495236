package graft.tools

import graft.fixtures.ScaleCorpus
import graft.llmops.Similarity
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sampled-vs-exact design-probe cost probe (r15, VERDICT r14 #3):
  * [[Similarity.topKDesignCosMilli]]'s exact probe is one full corpus scan
  * per (plan, k); past [[Similarity.TopKDesignSampleThreshold]] the
  * dispatch switches to a constant-size hash-sampled neighbor pool.
  * This measures both paths on the amplified corpus at each factor:
  * the design-cos values (sampled must be ≤ exact — the safe
  * direction), the table counts each derives, and the probe wall
  * times (the sampled probe's cost must stay ~flat as the corpus
  * grows while the exact probe's grows linearly).
  *
  * Usage: SPARK_GRAFT_SCALE_FACTOR=1000 runMain graft.tools.DesignCosProbe
  *
  * NATURAL-DISTRIBUTION LEG (r16, VERDICT r15 #5): the amplified
  * fixture plants exact copies, which concentrates the kth-neighbor
  * grade and exaggerates sampled-probe over-provisioning (measured 2×
  * tables at 1000× in r15). SPARK_GRAFT_DESIGN_CORPUS=gaussian swaps
  * in [[ScaleCorpus.gaussianMixture]] at SPARK_GRAFT_DESIGN_N vectors
  * (default 2,000,000 — past the sampling threshold) and measures the
  * same exact-vs-sampled design-cos and derived-table ratio on the
  * corpus shape real embeddings take.
  */
object DesignCosProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "1000").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-designcos-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("designcos").toString
    val embBase = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), col("label"))
    val corpusMode = sys.env.getOrElse("SPARK_GRAFT_DESIGN_CORPUS", "amplified")
    val gaussianN = sys.env.getOrElse("SPARK_GRAFT_DESIGN_N", "2000000").toLong

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    for (f <- Seq(1, factor).distinct) {
      val p = s"$root/emb$f"
      (if (corpusMode == "gaussian")
        ScaleCorpus.gaussianMixture(spark, gaussianN * f / factor.max(1))
      else ScaleCorpus.amplifyEmbeddings(embBase, f))
        .write.mode("overwrite").parquet(p)
      val emb = spark.read.parquet(p)
      val n = emb.count()
      val planes = Similarity.lshPlanesFor(n, Similarity.TopKOccupancy)
      // exact: probe the full corpus (bypass the memo + dispatch by
      // calling the sampled entry with target >= n — degenerates to
      // the exact pool per the spec-pinned contract)
      val (exact, tEx) = timed(
        Similarity.topKDesignCosSampledMilli(emb, 5, sampleTarget = n + 1))
      // sampled at the production pool size
      val (sampled, tSa) = timed(Similarity.topKDesignCosSampledMilli(emb, 5,
        Similarity.TopKDesignSampleSize))
      // derived at the production probe radius (r16 default)
      val tablesExact = Similarity.lshTablesFor(planes, exact,
        Similarity.TopKTargetRecallPpm, Similarity.TopKProbeRadius)
      val tablesSampled = Similarity.lshTablesFor(planes, sampled,
        Similarity.TopKTargetRecallPpm, Similarity.TopKProbeRadius)
      System.err.println(f"[designcos] ${f}x n=$n%,d planes=$planes " +
        f"exactMilli=$exact (t=$tEx%.1f s, tables=$tablesExact) " +
        f"sampledMilli=$sampled (t=$tSa%.1f s, tables=$tablesSampled) " +
        f"safe=${sampled <= exact}")
      // the PRODUCTION entry (threshold dispatch + memo) — proves the
      // zero-knob operator takes the sampled path past the threshold
      val (dispatch, tDi) = timed(Similarity.topKDesignCosMilli(emb, 5))
      System.err.println(f"[designcos] ${f}x dispatchMilli=$dispatch " +
        f"(t=$tDi%.1f s, path=${
          if (n > Similarity.TopKDesignSampleThreshold) "SAMPLED"
          else "exact"})")
    }
    spark.stop()
  }
}
