package graft.tools

import graft.reco.ContentRecommender
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Where does the champion-cap +1.2s live — the index-build stage or
  * downstream? Times (a) the prefix index build alone (count through
  * noop), capped vs not, and (b) the full operator, on a clean
  * session each. Usage: runMain graft.tools.CapStageDiag [sfDir] */
object CapStageDiag {
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
    def index(cap: Int) = {
      val w = ContentRecommender.tfidfWeights(docs, "doc_id", "text")
      val prefW = Window.partitionBy(col("id"))
        .orderBy(col("w").desc, col("term"))
      val un = w.withColumn("pr", row_number().over(prefW))
        .filter(col("pr") <= 4).select(col("id"), col("term"), col("w"))
      if (cap <= 0) un
      else {
        val postW = Window.partitionBy(col("term"))
          .orderBy(col("w").desc, col("id"))
        un.withColumn("pc", row_number().over(postW))
          .filter(col("pc") <= cap)
          .select(col("id"), col("term"), col("w"))
      }
    }
    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      System.err.println(f"[capstage] $label best=${ts.min}%.2f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    time("index_cap0")(index(0))
    time("index_cap2048")(index(2048))
    time("full_cap0")(ContentRecommender.similarDocsPrefix(
      docs, "doc_id", "text", k = 5, m = 4, postingCap = 0))
    time("full_cap2048")(ContentRecommender.similarDocsPrefix(
      docs, "doc_id", "text", k = 5, m = 4, postingCap = 2048,
      allowCapTruncation = true))
    spark.stop()
  }
}
