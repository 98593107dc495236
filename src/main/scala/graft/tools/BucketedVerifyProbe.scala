package graft.tools

import graft.fixtures.ScaleCorpus
import graft.llmops.Dedup
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r11 probe (VERDICT r10 "Next round" #1): A/B the prefix-join
  * family's verify stage — the r10 double shuffle-hash join (wide
  * pair×array intermediate re-shuffles once, the residual 1.18 local
  * exponent at 10→100×) vs the bucketed verify
  * (`verifyBuckets` > 0: pair rows stay narrow through every
  * exchange; doc arrays ship to each home bucket at most once).
  *
  * Usage:
  *   SPARK_GRAFT_SCALE_FACTOR=100 SPARK_GRAFT_VERIFY_BUCKETS=256 \
  *     runMain graft.tools.BucketedVerifyProbe [joins|bucketed|both]
  */
object BucketedVerifyProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "100").toInt
    val buckets = sys.env.getOrElse("SPARK_GRAFT_VERIFY_BUCKETS", "256").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val legs = args.headOption.getOrElse("both")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-bucketed-verify-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("bv-probe").toString
    val docsBase = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    ScaleCorpus.amplifyDocs(docsBase, factor)
      .write.mode("overwrite").parquet(s"$root/docs")
    val docs = spark.read.parquet(s"$root/docs")
    println(s"[probe] factor=$factor docs=${docs.count()} buckets=$buckets")

    // two passes per leg, both printed: pass 1 carries JVM/codegen
    // warmup (the r10 71.9 s vs 14.5 s first-leg artifact), pass 2 is
    // the comparable number; adjudicate on pass 2 + loadavg
    def time(label: String)(df: => DataFrame): Unit =
      for (rep <- 1 to 2) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val load = java.lang.management.ManagementFactory
          .getOperatingSystemMXBean.getSystemLoadAverage
        println(f"[probe] $label%-26s rep$rep ${(System.nanoTime() - t0) / 1e9}%8.2f s load=$load%.1f")
      }

    if (legs == "joins" || legs == "both") {
      time("q132_join_verify")(
        Dedup.prefixFilterJoin(docs, "doc_id", "text", 3, 0.5))
      time("q150_join_verify")(
        Dedup.containmentJoin(docs, "doc_id", "text", 3, 0.8))
    }
    if (legs == "bucketed" || legs == "both") {
      time("q132_bucketed")(
        Dedup.prefixFilterJoin(docs, "doc_id", "text", 3, 0.5,
          verifyBuckets = buckets))
      time("q150_bucketed")(
        Dedup.containmentJoin(docs, "doc_id", "text", 3, 0.8,
          verifyBuckets = buckets))
    }
    spark.stop()
  }
}
