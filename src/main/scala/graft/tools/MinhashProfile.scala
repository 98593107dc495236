package graft.tools

import graft.llmops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: stage-by-stage timing of the MinHash pipeline. */
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.documents(spark, dir)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val sh = docs.select(col("doc_id").as("id"),
      Dedup.shingles(col("text"), 2).as("sh"))
    time("shingles only")(sh.count())

    val sig = sh.select(col("id"),
      Dedup.minhashSignature(col("sh"), 64).as("sig"))
    time("shingles+signature")(sig.count())

    val sig2 = docs.select(col("doc_id").as("id"),
      Dedup.minhashSignature(Dedup.shingles(col("text"), 2), 64).as("sig"))
    time("fused signature (collapse check)")(sig2.count())

    time("full candidates")(
      Dedup.minhashCandidates(docs, "doc_id", "text", 2, 64, 16, 0.3).count())
    spark.stop()
  }
}
