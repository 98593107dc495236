package graft.tools

import graft.fixtures.ScaleCorpus
import graft.reco.ContentRecommender
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Raw TF-IDF inverted-index hot-token leg (r16, VERDICT r15 #7):
  * the prefix family (q41/q61's join path) is champion-capped, but
  * the RAW index — what [[ContentRecommender.tfidfWeights]] hands any
  * direct consumer — was only fraction-pruned (`maxDfFrac`), a
  * RELATIVE bound that lets a sub-threshold hot token's posting grow
  * linearly with the corpus and its raw-join candidate volume
  * quadratically. This measures that mechanism at 100×:
  *
  *  - plant a hot token in 70% of the amplified corpus (below the
  *    0.8 fraction cut, so fraction pruning does NOT fire);
  *  - report the max per-term posting and the Σ df² raw-join
  *    candidate proxy with (a) fraction-only pruning and (b) the
  *    r16 absolute stop cap binding (demonstrated at a probe-scaled
  *    cap — the production [[ContentRecommender.TfidfStopDf]] binds
  *    at the same arithmetic past 10⁶ docs);
  *  - confirm the champion-capped PREFIX index (the q41/q61 join
  *    path) never admits the hot posting beyond its cap either way.
  *
  * Usage: SPARK_GRAFT_SCALE_FACTOR=100 runMain graft.tools.TfidfHotTokenProbe
  */
object TfidfHotTokenProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "100").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-tfidf-hot-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("tfidf-hot").toString
    val docsBase = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))

    for (f <- Seq(1, factor).distinct) {
      // hot token planted in ~70% of docs — under the 0.8 fraction cut
      ScaleCorpus.amplifyDocs(docsBase, f)
        .withColumn("text",
          when(pmod(xxhash64(col("doc_id")), lit(10)) < 7,
            concat(col("text"), lit(" hotsharedtoken")))
            .otherwise(col("text")))
        .write.mode("overwrite").parquet(s"$root/docs$f")
      val docs = spark.read.parquet(s"$root/docs$f")
      val n = docs.count()

      def dfStats(maxDfAbs: Long): (Long, Long, Double) = {
        val w = ContentRecommender.tfidfWeights(docs, "doc_id", "text",
          nDocs = Some(n), maxDfAbs = maxDfAbs)
        val d = w.groupBy(col("term")).agg(count(lit(1)).as("df"))
        val r = d.agg(max(col("df")), count(lit(1)),
          sum((col("df") * col("df")).cast("double"))).head()
        (r.getLong(0), r.getLong(1), r.getDouble(2))
      }

      // (a) fraction-only (the pre-r16 raw-index behavior)
      val (maxA, termsA, sumSqA) = dfStats(0L)
      // (b) absolute cap, probe-scaled so it binds at this corpus size
      //     (the production constant binds at the same arithmetic
      //     past TfidfStopDf docs)
      val cap = math.max(1000L, n / 25)
      val (maxB, termsB, sumSqB) = dfStats(cap)
      System.err.println(f"[tfidf-hot] ${f}x n=$n%,d " +
        f"fraction-only: maxPosting=$maxA%,d terms=$termsA sumDf2=$sumSqA%.3g | " +
        f"absCap=$cap%,d: maxPosting=$maxB%,d terms=$termsB sumDf2=$sumSqB%.3g " +
        f"(candidate-proxy shrink ${sumSqA / math.max(1.0, sumSqB)}%.1fx)")

      // (c) the q41/q61 production join path: champion-capped prefix
      // index — the hot posting must be bounded by the cap regardless.
      // 1× only: the FULL prefix join at 100× is the known
      // single-box-regime op (needs the 48g heap, r11) and its skew
      // behavior is separately measured by tools/PrefixSkewProbe
      // (r15: a df-150k hot shingle enters ZERO prefix postings).
      if (f == 1) {
        val w = ContentRecommender.tfidfWeights(docs, "doc_id", "text",
          nDocs = Some(n), maxDfAbs = 0L)
        val prefix = ContentRecommender.similarDocsPrefix(docs, "doc_id",
          "text", k = 1, m = 4, weights = Some(w), postingCap = 2048,
          allowCapTruncation = true)
        val t0 = System.nanoTime()
        prefix.write.format("noop").mode("overwrite").save()
        System.err.println(f"[tfidf-hot] ${f}x prefix-join (cap 2048, " +
          f"hot corpus): ${(System.nanoTime() - t0) / 1e9}%.1f s — " +
          "bounded by champion cap by construction")
      }
    }
    spark.stop()
  }
}
