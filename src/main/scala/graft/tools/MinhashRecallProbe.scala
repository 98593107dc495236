package graft.tools

import graft.fixtures.ScaleCorpus
import graft.llmops.Dedup
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MinHash banding recall with planted ground truth (r13, VERDICT r12
  * #3): SCALE.md argued the family's recall is scale-invariant "by
  * construction" (banding is pair-local) — the repo's own standard is
  * attribute-first, MEASURE-always (the r12 SimHash section is titled
  * "wall time lied"), so this closes the recall matrix's last
  * argued-not-measured cell.
  *
  * Ground truth: [[ScaleCorpus.plantedDocPairs]] — pair-unique
  * vocabularies at mutation levels with CLOSED-FORM 2-shingle Jaccard
  * J = (L−1−m)/(L−1+m), planted into an amplified background corpus.
  * For each level the probe reports, at 1× and N× background:
  *   - measured exact Jaccard (sanity against the closed form),
  *   - banding recall (candidate surfaced at threshold 0 — pure
  *     band-collision probability) vs the theory S-curve 1−(1−J^r)^b,
  *   - gate recall (est_jaccard ≥ the gate threshold 0.3 — the full
  *     q64 product semantics).
  * Scale invariance = per-level recall at N× matches 1× within
  * binomial noise; the theory column pins WHERE on the S-curve each
  * level sits. Variants probed at their gate operating points:
  * portable (q64/q79/q96: k=2, 32 hashes, 8 bands → r=4) and fast
  * (q35: k=2, 64 hashes, 16 bands → r=4).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
  *        SPARK_GRAFT_SCALE_FACTOR=100 runMain graft.tools.MinhashRecallProbe
  */
object MinhashRecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "100").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-minhash-recall-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INITIAL_PARTITIONS", "512"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("mh-recall").toString
    val docsBase = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    def stage(name: String, df: DataFrame): DataFrame = {
      val p = s"$root/$name"
      df.write.mode("overwrite").parquet(p)
      spark.read.parquet(p)
    }
    require(factor <= 100,
      "plantedDocPairs' default idBase only clears amplifyDocs ids up to 100x")
    val planted = stage("planted", ScaleCorpus.plantedDocPairs(spark)).cache()
    val pairsMeta = planted.filter(col("role") === "a")
      .select((col("doc_id")).as("id_a"), (col("doc_id") + 1L).as("id_b"),
        col("pair_id"), col("level"))
      .cache()

    // sanity: measured exact Jaccard per level vs the closed form
    val measuredJ = Dedup.exactJaccard(
        planted.select(col("doc_id"), col("text")),
        pairsMeta.select(col("id_a"), col("id_b")),
        "doc_id", "text", shingleK = 2)
      .join(pairsMeta, Seq("id_a", "id_b"))
      .groupBy(col("level"))
      .agg(min(col("jaccard")).as("jmin"), max(col("jaccard")).as("jmax"))
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    val L = 50
    measuredJ.toSeq.sortBy(_._1).foreach { case (m, (jmin, jmax)) =>
      val closed = (L - 1 - m).toDouble / (L - 1 + m)
      System.err.println(f"[mhrecall] level=$m%2d closed_J=$closed%.4f " +
        f"measured_J=[$jmin%.4f,$jmax%.4f]")
    }

    def recallTable(tag: String, found: DataFrame, r: Int, b: Int,
        gateThreshold: Double): Unit = {
      val hit = pairsMeta.join(found, Seq("id_a", "id_b"), "left")
        .groupBy(col("level"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("est_jaccard").isNotNull, 1L).otherwise(0L))
            .as("band_hits"),
          sum(when(col("est_jaccard") >= gateThreshold, 1L).otherwise(0L))
            .as("gate_hits"))
        .collect().map(row => (row.getInt(0), row.getLong(1),
          row.getLong(2), row.getLong(3)))
        .sortBy(_._1)
      hit.foreach { case (m, n, bandHits, gateHits) =>
        val j = (L - 1 - m).toDouble / (L - 1 + m)
        val theory = 1.0 - math.pow(1.0 - math.pow(j, r.toDouble), b.toDouble)
        System.err.println(f"[mhrecall] $tag level=$m%2d J=$j%.3f " +
          f"theory=$theory%.3f band_recall=${bandHits.toDouble / n}%.3f " +
          f"gate_recall=${gateHits.toDouble / n}%.3f n=$n")
      }
    }

    for (f <- Seq(1, factor)) {
      val corpus = stage(s"corpus$f",
        ScaleCorpus.amplifyDocs(docsBase, f)
          .unionByName(planted.select(col("doc_id"), col("text"))))
      val n = corpus.count()
      // threshold 0 keeps EVERY banding candidate with its est_jaccard
      // attached — band recall and gate recall come from one output
      val portable = stage(s"found_portable_$f",
        Dedup.minhashCandidatesPortable(corpus, "doc_id", "text",
          shingleK = 2, numHashes = 32, bands = 8, threshold = 0.0))
      System.err.println(s"[mhrecall] --- portable (32 hashes, 8 bands) " +
        s"background=${f}x corpus_docs=$n ---")
      recallTable(s"portable ${f}x", portable, r = 4, b = 8,
        gateThreshold = 0.3)
      val fast = stage(s"found_fast_$f",
        Dedup.minhashCandidates(corpus, "doc_id", "text",
          shingleK = 2, numHashes = 64, bands = 16, threshold = 0.0))
      System.err.println(s"[mhrecall] --- fast (64 hashes, 16 bands) " +
        s"background=${f}x corpus_docs=$n ---")
      recallTable(s"fast ${f}x", fast, r = 4, b = 16, gateThreshold = 0.3)
    }
    spark.stop()
  }
}
