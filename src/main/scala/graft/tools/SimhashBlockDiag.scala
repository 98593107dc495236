package graft.tools

import graft.fixtures.ScaleCorpus
import graft.llmops.Dedup
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Counts-only diagnostic for the simhash blocking parameterizations
  * (r12): the 100× wall-time probe showed block16 (k=4,t=1) and Manku
  * (k=6,t=3) within 20% of each other — but wall time at one scale
  * can hide a quadratic candidate term under streaming throughput
  * (the q41 lesson: attribute the volume BEFORE trusting the trend).
  * This reports, for each parameterization at 1× and N×: index rows,
  * bucket count, max bucket occupancy, and the exact pre-dedup
  * candidate volume Σ_buckets C(occ, 2) — no pair row is ever
  * materialized, so the diag is cheap even where the pair join would
  * not be.
  *
  * The key packing below mirrors Dedup.simhashPairs (same contiguous
  * block widths, same combination enumeration); it is a diagnostic
  * twin, not a second implementation of the operator.
  */
object SimhashBlockDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "100").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-simhash-diag")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INITIAL_PARTITIONS", "512"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("simhash-diag").toString
    val docsBase = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    def stage(name: String, df: DataFrame): DataFrame = {
      val p = s"$root/$name"
      df.write.mode("overwrite").parquet(p)
      spark.read.parquet(p)
    }
    val docs1 = stage("docs1", ScaleCorpus.amplifyDocs(docsBase, 1))
    val docsN = stage(s"docs$factor", ScaleCorpus.amplifyDocs(docsBase, factor))

    def diag(docs: DataFrame, label: String, maxHamming: Int,
        kBlocks: Int, keyBlocks: Int): Unit = {
      val nBlocks = if (kBlocks <= 0) maxHamming + 1 else kBlocks
      val widths = Array.tabulate(nBlocks)(i =>
        64 / nBlocks + (if (i < 64 % nBlocks) 1 else 0))
      val offsets = widths.scanLeft(0)(_ + _)
      def blockExpr(i: Int) = {
        val mask = if (widths(i) == 64) -1L else (1L << widths(i)) - 1L
        shiftrightunsigned(col("sh"), offsets(i)).bitwiseAND(mask)
      }
      val combos = (0 until nBlocks).combinations(keyBlocks).toSeq
      val blockStructs = array(combos.zipWithIndex.map { case (c, ci) =>
        val packed = c.foldLeft((lit(0L), 0)) { case ((acc, shift), bi) =>
          (acc.bitwiseOR(shiftleft(blockExpr(bi), shift)), shift + widths(bi))
        }._1
        struct(lit(ci).as("q"), packed.as("qkey"))
      }: _*)
      val sh = Dedup.simhashes(docs, "doc_id", "text")
      val occ = sh.select(explode(blockStructs).as("qq"))
        .groupBy(col("qq.q"), col("qq.qkey")).agg(count(lit(1)).as("occ"))
      val r = occ.agg(
        count(lit(1)).as("n_buckets"),
        max(col("occ")).as("max_occ"),
        sum(col("occ")).as("index_rows"),
        sum(col("occ") * (col("occ") - 1)).cast("long").as("twice_candidates")).head()
      System.err.println(f"[shdiag] $label k=$nBlocks t=$keyBlocks " +
        f"tables=${combos.size} index_rows=${r.getLong(2)}%,d " +
        f"buckets=${r.getLong(0)}%,d max_occ=${r.getLong(1)}%,d " +
        f"candidates=${r.getLong(3) / 2}%,d")
    }

    for ((docs, tag) <- Seq((docs1, "1x"), (docsN, s"${factor}x"))) {
      // r13: the operator's DERIVED point for this corpus size sits in
      // the comparison — at gate scale it coincides with (4,1), at the
      // saturated 5M-doc size it is (5,2)
      val (dk, dt) = Dedup.simhashBlocksFor(docs.count().max(1L), 3)
      for ((k, t) <- (Seq((4, 1), (6, 3)) :+ ((dk, dt))).distinct) {
        val lbl = if ((k, t) == ((dk, dt))) s"$tag DERIVED" else tag
        diag(docs, lbl, maxHamming = 3, kBlocks = k, keyBlocks = t)
      }
    }
    spark.stop()
  }
}
