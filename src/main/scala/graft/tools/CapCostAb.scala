package graft.tools

import graft.reco.ContentRecommender
import graft.sources.Tables

/** A/B: cost of the r11 champion-cap window at a scale where the cap
  * never binds (sf0.1, max posting 1164 < 2048). Sweeps cap values —
  * notably across Spark's windowGroupLimitThreshold (1000): rank
  * limits above it lose the WindowGroupLimit pushdown and pay a full
  * per-partition sort. Best-of-3, interleaved.
  * Usage: runMain graft.tools.CapCostAb [sfDir]
  */
object CapCostAb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
