package graft.tools

import graft.fixtures.ScaleCorpus
import graft.llmops.Dedup
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-off r10 diagnostic for the q132/q150 100× knee (VERDICT r9
  * "Next round" #2): times each STAGE of the prefix-filter join at a
  * given amplification and prints the physical join strategies, so
  * the super-linear decade (10×→100× local exponent ≈ 1.4) can be
  * attributed to a stage instead of guessed at. The
  * initialPartitionNum=512 A/B already rejected partition sizing
  * (345 s → 429 s).
  *
  * Usage: SPARK_GRAFT_SCALE_FACTOR=100 runMain graft.tools.PrefixJoinDiag
  */
object PrefixJoinDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "100").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-prefix-diag")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("prefix-diag").toString
    val docsBase = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    ScaleCorpus.amplifyDocs(docsBase, factor)
      .write.mode("overwrite").parquet(s"$root/docs")
    val docs = spark.read.parquet(s"$root/docs")

    def time(label: String)(df: DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[diag] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    val threshold = 0.5
    val sh = Dedup.shingleSets(docs, "doc_id", "text", 3)
    time("shingle_kernel")(sh)
    // mirrors the operator's r11 shape: set size rides through the
    // explode, no second count window
    val inst = sh.select(col("id"), size(col("sh")).cast("long").as("n"),
      explode(col("sh")).as("t"))
    time("instance_explode")(inst)
    val freq = inst.groupBy(col("t")).agg(count(lit(1)).as("f"))
    time("global_freq")(freq)
    val wRank = Window.partitionBy(col("id")).orderBy(col("f"), col("t"))
    val prefixes = inst.join(freq, Seq("t"))
      .withColumn("rk", row_number().over(wRank))
      .filter(col("rk") <= col("n") - ceil(lit(threshold) * col("n")) + 1)
      .select(col("id"), col("t"))
    time("prefixes(freq+1window)")(prefixes)
    // materialize prefixes so the candidate stage is timed alone
    prefixes.write.mode("overwrite").parquet(s"$root/prefixes")
    val pre = spark.read.parquet(s"$root/prefixes")
    val candidates = pre.as("a")
      .join(pre.as("b"), col("a.t") === col("b.t") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    time("candidates(self-join)")(candidates)
    candidates.write.mode("overwrite").parquet(s"$root/cand")
    val cand = spark.read.parquet(s"$root/cand")
    println(s"[diag] n_prefix_rows=${pre.count()} n_candidates=${cand.count()}")
    val verify = Dedup.exactJaccardOn(sh, cand)
      .filter(col("jaccard") >= threshold)
    time("verify(jaccard-on-cand)")(verify)
    time("full_q132")(Dedup.prefixFilterJoin(docs, "doc_id", "text", 3, threshold))
    println("[diag] ---- candidate-join plan ----")
    candidates.explain("formatted")
    println("[diag] ---- verify plan ----")
    verify.explain("formatted")
    spark.stop()
  }
}
