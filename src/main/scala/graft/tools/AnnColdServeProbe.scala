package graft.tools

import graft.fixtures.ScaleCorpus
import graft.llmops.{AnnIndexSnapshot, Similarity}
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cold-session serve-path probe for the persisted ANN index at 100×
  * (r17, VERDICT r16 "Next round" #7): q176 proves load-vs-computed
  * equality at fixture scale; this measures the production claim —
  * a RESTARTED serving driver loads the persisted radius-1 LSH
  * snapshot over the 100× corpus and serves top-k WITHOUT refitting
  * (no design probe, no bucket pass), at what latency and recall.
  *
  * Protocol: session A amplifies the sf corpus 100×, persists it, and
  * builds the index snapshot through [[AnnIndexSnapshot.lshTopKIndex]]
  * (timed: the one-time build cost a restart must not re-pay).
  * Session A stops; a NEW SparkSession starts with empty session
  * memos (ModelMemo is session-keyed) — session-cold, JVM-warm
  * (documented; a colder read would only add constant JVM start
  * time). The cold session loads the index (created* MUST read false
  * — any refit is a lifecycle regression), serves the q89-style
  * 20-query subset through the loaded buckets, and scores recall@5
  * against exact brute-force truth.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
  *        SPARK_GRAFT_SCALE_FACTOR=100 runMain graft.tools.AnnColdServeProbe
  */
object AnnColdServeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "100").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    def newSession(): SparkSession = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-ann-cold-serve")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val root = java.nio.file.Files.createTempDirectory("ann-cold").toString
    val corpusPath = s"$root/emb$factor"
    val indexDir = s"$root/index"

    // ---- session A: stage the 100x corpus, build + persist the index
    {
      val spark = newSession()
      spark.sparkContext.setLogLevel("WARN")
      val embBase = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding"), col("label"))
      ScaleCorpus.amplifyEmbeddings(embBase, factor)
        .write.mode("overwrite").parquet(corpusPath)
      val emb = spark.read.parquet(corpusPath)
      val n = emb.count()
      val (idx, tBuild) = timed {
        val i = AnnIndexSnapshot.lshTopKIndex(emb, k = 5, dim = 64,
          baseDir = indexDir, corpusVersion = "v100")
        i.buckets.count() // force the bucket pass to disk
        i
      }
      System.err.println(f"[anncold] build n=$n%,d planes=${idx.planes} " +
        f"tables=${idx.tables} designCosMilli=${idx.designCosMilli} " +
        f"created=${idx.createdParams}/${idx.createdBuckets} t=$tBuild%.1f s")
      spark.stop()
      graft.ml.ModelMemo.clear()
    }

    // ---- session B: COLD load + serve (no refit allowed) ------------
    {
      val spark = newSession()
      spark.sparkContext.setLogLevel("WARN")
      val emb = spark.read.parquet(corpusPath)
      val (idx, tLoad) = timed(
        AnnIndexSnapshot.lshTopKIndex(emb, k = 5, dim = 64,
          baseDir = indexDir, corpusVersion = "v100"))
      require(!idx.createdParams && !idx.createdBuckets,
        "cold session REFIT the persisted index — lifecycle regression")
      val queries = emb.filter(col("vec_id") < 20)
      val (served, tServe) = timed {
        val s = AnnIndexSnapshot.lshTopKWithIndex(emb, idx, k = 5)
          .filter(col("query_id") < 20)
          .select(col("query_id"), col("neighbor_id")).cache()
        s.count(); s
      }
      val (truth, tTruth) = timed {
        val t = Similarity.bruteForceTopKQueriesBroadcast(queries, emb, 5)
          .select(col("query_id"), col("neighbor_id")).cache()
        t.count(); t
      }
      val nTruth = truth.count()
      val hits = truth.join(served, Seq("query_id", "neighbor_id")).count()
      System.err.println(f"[anncold] cold load t=$tLoad%.2f s (no refit), " +
        f"serve 20 queries t=$tServe%.1f s, recall@5=${
          hits.toDouble / nTruth}%.3f ($hits/$nTruth), " +
        f"exact truth for comparison t=$tTruth%.1f s")
      println(f"""{"probe":"ann_cold_serve","factor":$factor,""" +
        f""""planes":${idx.planes},"tables":${idx.tables},""" +
        f""""design_cos_milli":${idx.designCosMilli},""" +
        f""""cold_load_s":$tLoad%.2f,"serve20_s":$tServe%.2f,""" +
        f""""exact20_s":$tTruth%.2f,"recall_at_5":${hits.toDouble / nTruth}%.3f,""" +
        f""""refit":false}""")
      spark.stop()
    }
  }
}
