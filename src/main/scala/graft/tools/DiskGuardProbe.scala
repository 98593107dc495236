package graft.tools

import graft.fixtures.ScaleCorpus
import graft.llmops.Dedup
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Demonstrates the r13 fail-fast disk-budget guard at the corpus
  * sizes that matter (VERDICT r12 #4): the r12 1000× prefix-join legs
  * each burned >70 GB of shuffle spill and minutes of work before the
  * OS killed the JVM; with the guard, the SAME call must fail in
  * seconds with the explanatory message, and the 100× call (which this
  * box genuinely completes) must pass the guard untouched.
  *
  * The guard is EAGER inside the operator call while the join itself is
  * lazy, so invoking `prefixFilterJoin` without an action times exactly
  * the guard: its one scan-only aggregation plus the throw/pass
  * decision. Legs:
  *   - each factor in SPARK_GRAFT_GUARD_FACTORS (default 100,1000):
  *     stage docs ×factor, call prefixFilterJoin, report
  *     PASS/THROW + guard seconds (+ first line of the message).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
  *        runMain graft.tools.DiskGuardProbe
  */
object DiskGuardProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factors = sys.env.getOrElse("SPARK_GRAFT_GUARD_FACTORS", "100,1000")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-disk-guard-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("disk-guard").toString
    val docsBase = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    def stage(name: String, df: DataFrame): DataFrame = {
      val p = s"$root/$name"
      df.write.mode("overwrite").parquet(p)
      spark.read.parquet(p)
    }
    factors.foreach { f =>
      val docs = stage(s"docs$f", ScaleCorpus.amplifyDocs(docsBase, f))
      val t0 = System.nanoTime()
      val outcome =
        try {
          Dedup.prefixFilterJoin(docs, "doc_id", "text",
            shingleK = 3, threshold = 0.5)
          "PASS (join not executed — guard only)"
        } catch {
          case e: IllegalStateException =>
            s"THROW: ${e.getMessage.takeWhile(_ != '\n').take(160)}"
        }
      val secs = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[diskguard] factor=$f guard_secs=$secs%.1f $outcome")
    }
    spark.stop()
  }
}
