package graft.tools

import graft.fixtures.ScaleCorpus
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Diagnostic for the q41 100× crash (r11): measures the PREFIX-term
  * posting-length distribution and the implied candidate-pair volume
  * Σ_t cnt_t² of [[graft.reco.ContentRecommender.similarDocsPrefix]]
  * WITHOUT running the pair join — confirms (or refutes) the
  * hot-posting hypothesis before any fix is attempted.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_SCALE_FACTOR=N
  *        runMain graft.tools.PrefixPostingDiag
  */
object PrefixPostingDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("prefix-posting-diag")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = ScaleCorpus.amplifyDocs(
      Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
      factor)
    val w = graft.reco.ContentRecommender.tfidfWeights(docs, "doc_id", "text")
    val prefW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("w").desc, col("term"))
    val prefix = w.withColumn("pr", row_number().over(prefW))
      .filter(col("pr") <= 4)
    val posting = prefix.groupBy(col("term"))
      .agg(count(lit(1)).as("cnt")).cache()
    val stats = posting.agg(
      count(lit(1)).as("n_terms"),
      sum(col("cnt")).as("entries"),
      max(col("cnt")).as("max_cnt"),
      sum(col("cnt") * col("cnt")).as("pair_volume")).collect()(0)
    System.err.println(s"[diag] factor=$factor n_prefix_terms=${stats.get(0)} " +
      s"entries=${stats.get(1)} max_posting=${stats.get(2)} " +
      s"pair_volume=${stats.get(3)}")
    val top = posting.orderBy(col("cnt").desc).limit(12).collect()
    top.foreach(r => System.err.println(
      s"[diag]   hot term '${r.get(0)}' cnt=${r.get(1)}"))
    spark.stop()
  }
}
