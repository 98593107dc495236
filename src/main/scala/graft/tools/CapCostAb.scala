package graft.tools

import graft.reco.ContentRecommender
import graft.sources.Tables

/** A/B: cost of the r11 champion-cap window at a scale where the cap
  * never binds (sf0.1, max posting 1164 < 2048). Sweeps cap values —
  * notably across Spark's windowGroupLimitThreshold (1000): rank
  * limits above it lose the WindowGroupLimit pushdown and pay a full
  * per-partition sort. Best-of-3, interleaved.
  * Usage: runMain graft.tools.CapCostAb [sfDir]
  *
  * GUARD-COST MODE (r13, VERDICT r12 #6): set SPARK_GRAFT_CAP_FACTORS
  * (e.g. "1,10,100") to measure the STRICT sentinel-count guard's own
  * cost under corpus growth instead. The guard runs EAGERLY inside the
  * operator call (index build + cache + the O(index) sentinel count)
  * while the pair join stays lazy, so call-only timing isolates the
  * guard path; the allow=true call (fully lazy, ~0 s) is the baseline.
  * O(index) confirmation = the strict-call trend tracks index rows
  * (×factor on the amplified corpus) and its absolute cost stays a
  * sliver of the pair stage it guards (212 s at 100×, r11) — the
  * guard path cannot touch pairs by construction (it counts the
  * cached index BEFORE any self-join exists in the plan).
  */
object CapCostAb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val guardFactors = sys.env.get("SPARK_GRAFT_CAP_FACTORS")
      .map(_.split(",").map(_.trim.toInt).toSeq)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, dir)

    guardFactors.foreach { factors =>
      val root = java.nio.file.Files.createTempDirectory("cap-guard").toString
      val base = docs.select(
        org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
      factors.foreach { f =>
        val p = s"$root/docs$f"
        graft.fixtures.ScaleCorpus.amplifyDocs(base, f)
          .write.mode("overwrite").parquet(p)
        val d = spark.read.parquet(p)
        def callOnly(allow: Boolean): Double = {
          val t0 = System.nanoTime()
          ContentRecommender.similarDocsPrefix(d, "doc_id", "text",
            k = 5, m = 4, postingCap = 2048, allowCapTruncation = allow)
          val t = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache()
          t
        }
        // interleaved best-of-2 per mode; lazy call first (baseline)
        val lazyT = (1 to 2).map(_ => callOnly(allow = true)).min
        val strictT = (1 to 2).map(_ => callOnly(allow = false)).min
        System.err.println(f"[capguard] factor=$f lazy_call=$lazyT%.2f " +
          f"strict_guard_call=$strictT%.2f (index build + cache + " +
          "sentinel count; pair join untouched)")
      }
      spark.stop()
      return
    }

    val caps = Seq(0, 1000, 2048)
    def run(cap: Int): Double = {
      val t0 = System.nanoTime()
      ContentRecommender
        .similarDocsPrefix(docs, "doc_id", "text", k = 5, m = 4,
          postingCap = cap, allowCapTruncation = true)
        .write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }
    caps.foreach(run) // warmup, discarded
    val best = scala.collection.mutable.Map[Int, Double]()
    for (_ <- 1 to 3; c <- caps) {
      val t = run(c)
      best(c) = math.min(best.getOrElse(c, Double.MaxValue), t)
      System.err.println(f"[capab] cap=$c t=$t%.2f")
    }
    caps.foreach(c => System.err.println(f"[capab] BEST cap=$c ${best(c)}%.2f"))
    spark.stop()
  }
}
