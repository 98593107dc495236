package graft.tools

import graft.fixtures.ScaleCorpus
import graft.llmops.Dedup
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Counts-only candidate-volume curve for the prefix Jaccard join
  * (r12): the q132 1000× leg died filling >70 GB of shuffle, and the
  * telemetry shows verify-exchange bytes grew ×10 then ×28 across the
  * measured decades while wall time stayed ~linear — so the question
  * is whether CANDIDATE volume (pairs) is super-linear on this corpus
  * and why. This measures it without ever materializing the verify:
  *  - `raw` = prefix-join matches before the pair aggregation (a pure
  *    count over the join stream — no pair ever shuffles), the row
  *    volume the groupBy exchange moves;
  *  - `grouped` = fully PPJoin-filtered candidates (needs the pair
  *    groupBy shuffle — skipped above the factor cap where that
  *    exchange itself is the disk risk).
  *
  * Usage: SPARK_GRAFT_CAND_FACTORS=1,10,100,1000
  *        SPARK_GRAFT_CAND_GROUP_MAX=100 runMain graft.tools.PrefixCandDiag
  */
object PrefixCandDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factors = sys.env.getOrElse("SPARK_GRAFT_CAND_FACTORS", "1,10,100")
      .split(",").map(_.trim.toInt).toSeq
    val groupMax = sys.env.getOrElse("SPARK_GRAFT_CAND_GROUP_MAX", "100").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-prefix-cand-diag")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INITIAL_PARTITIONS", "512"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("prefix-cand").toString
    val docsBase = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    factors.foreach { f =>
      val p = s"$root/docs$f"
      ScaleCorpus.amplifyDocs(docsBase, f).write.mode("overwrite").parquet(p)
      val docs = spark.read.parquet(p)
      val raw = Dedup.prefixJaccardCandidates(docs, "doc_id", "text",
        shingleK = 3, threshold = 0.5, grouped = false).count()
      val grouped =
        if (f <= groupMax)
          Dedup.prefixJaccardCandidates(docs, "doc_id", "text",
            shingleK = 3, threshold = 0.5).count().toString
        else "skipped(group-exchange=disk-risk)"
      System.err.println(f"[prefixcand] factor=$f raw=$raw%,d grouped=$grouped")
    }
    spark.stop()
  }
}
