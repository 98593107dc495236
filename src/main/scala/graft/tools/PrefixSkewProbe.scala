package graft.tools

import graft.fixtures.ScaleCorpus
import graft.llmops.Dedup
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hot-token skew probe for the prefix-join family (r15, VERDICT r14
  * #7): the q132/q161 scale evidence runs fixture-shaped token
  * distributions, but the scaladoc names the classic inverted-index
  * risk — a term whose posting list is a large corpus fraction turns
  * the term-key shuffle into one giant bucket
  * (`reco/ContentRecommender.scala` design note). The prefix filter's
  * structural answer is the rarest-first order: a doc's JOIN keys are
  * its |x| − ⌈t·|x|⌉ + 1 RAREST shingles, so a corpus-hot shingle
  * ranks last and enters a prefix only when the prefix covers the
  * whole set (degenerate tiny docs). This probe measures that claim
  * instead of trusting it: a hot trigram is planted in `HotShare` of
  * all docs at `factor`× and the probe reports the hot shingle's raw
  * document frequency vs its PREFIX posting size, the max prefix
  * posting overall, candidate volume, and the full-join wall time,
  * hot vs unplanted.
  *
  * Usage: SPARK_GRAFT_SCALE_FACTOR=100 runMain graft.tools.PrefixSkewProbe
  */
object PrefixSkewProbe {
  private val HotShare = 0.3
  private val HotText = " hotxq hotyq hotzq" // one shared trigram shingle

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "100").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-prefix-skew-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("prefix-skew").toString
    val docsBase = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    ScaleCorpus.amplifyDocs(docsBase, factor)
      .write.mode("overwrite").parquet(s"$root/docs")
    val docs = spark.read.parquet(s"$root/docs")
    // plant the hot trigram into a deterministic 30% of ALL docs
    // (across copies — corpus-wide document frequency ≈ HotShare)
    docs.withColumn("text",
        when(pmod(col("doc_id"), lit(10L)) < lit((HotShare * 10).toLong),
          concat(col("text"), lit(HotText))).otherwise(col("text")))
      .write.mode("overwrite").parquet(s"$root/hotdocs")
    val hotDocs = spark.read.parquet(s"$root/hotdocs")

    val threshold = 0.5
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    for ((label, d) <- Seq("baseline" -> docs, "hot30pct" -> hotDocs)) {
      val n = d.count()
      // replicate the operator's EXACT prefix construction
      // (Dedup.prefixJaccardCandidates: rank by (f, xxhash64 tie),
      // integer ⌈T·n/1e6⌉ prefix bound — r15 review: the earlier
      // string-tie/double-ceil mirror measured a DIFFERENT prefix set
      // than the one the operator shuffles). The string column rides
      // along purely for the diagnostic report.
      val T = math.floor(threshold * 1e6).toLong
      val sh = Dedup.shingleSets(d, "doc_id", "text", 3)
      val inst = sh.select(col("id"), size(col("sh")).cast("long").as("n"),
        explode(col("sh")).as("t"))
      val freq = inst.groupBy(col("t")).agg(count(lit(1)).as("f"))
      val wRank = Window.partitionBy(col("id"))
        .orderBy(col("f"), xxhash64(col("t")))
      val prefixes = inst.join(freq, Seq("t"))
        .withColumn("rk", row_number().over(wRank).cast("long"))
        .filter(expr(s"rk <= n - (($T * n + 999999) DIV 1000000) + 1"))
        .select(col("id"), col("t"))
      val posting = prefixes.groupBy(col("t"))
        .agg(count(lit(1)).as("p")).cache()
      val maxPosting = posting.agg(max(col("p"))).head().getLong(0)
      val hotShingle = "hotxq hotyq hotzq"
      val hotDf = inst.filter(col("t") === hotShingle).count()
      val hotPrefix = posting.filter(col("t") === hotShingle)
        .collect().headOption.map(_.getLong(1)).getOrElse(0L)
      posting.unpersist()
      val (nCand, tCand) = timed(
        Dedup.prefixJaccardCandidates(d, "doc_id", "text", 3, threshold).count())
      val (nPairs, tFull) = timed(
        Dedup.prefixFilterJoin(d, "doc_id", "text", 3, threshold).count())
      System.err.println(f"[prefixskew] $label ${factor}x n=$n%,d " +
        f"hot_df=$hotDf%,d hot_prefix_posting=$hotPrefix%,d " +
        f"max_prefix_posting=$maxPosting%,d candidates=$nCand%,d " +
        f"(t=$tCand%.1f s) pairs=$nPairs%,d full_t=$tFull%.1f s")
    }
    spark.stop()
  }
}
