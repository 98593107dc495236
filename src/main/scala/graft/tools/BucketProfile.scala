package graft.tools
import graft.llmops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object BucketProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.documents(spark, dir)
    val withSig = docs.select(col("doc_id").as("id"), Dedup.shingles(col("text"), 2).as("sh"))
      .select(col("id"), Dedup.minhashSignature(col("sh"), 64).as("sig"))
    val banded = withSig.select(col("id"), explode(Dedup.lshBands(col("sig"), 16, 4)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.band_hash").as("band_hash"))
    val sizes = banded.groupBy("band", "band_hash").agg(count(lit(1)).as("n"))
    sizes.agg(sum(col("n") * col("n")).as("pair_vol"), max("n").as("max_bucket"),
      count(lit(1)).as("n_buckets")).show()
    spark.stop()
  }
}
