package graft.tools

import graft.fixtures.ScaleCorpus
import graft.llmops.Similarity
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF recall-at-scale probe (r12, the [[LshRecallProbe]] twin for the
  * KMeans-cell path): does occupancy-held cell scaling
  * ([[Similarity.ivfCellsFor]]) shed top-k recall as the corpus grows,
  * and does nProbe recover it? Ground truth = brute-force top-k for a
  * deterministic query sample (sample × corpus is linear in n, cheap
  * at any factor). Legs: 1× gate point (8 cells, probe 2); N× derived
  * cells at probe 2; N× derived cells at probe 8. The fixed-cells
  * anti-pattern needs no leg — candidates are n·nProbe·(n/nCells),
  * quadratic by arithmetic once cells freeze (10 B cosines at 100×).
  */
object IvfRecallProbe {
  private val IdShift = 10000000L
  private val K = 5

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "100").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-ivf-recall-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INITIAL_PARTITIONS", "512"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("ivf-recall").toString
    val embBase = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), col("label"))
    def stage(name: String, df: DataFrame): DataFrame = {
      val p = s"$root/$name"
      df.write.mode("overwrite").parquet(p)
      spark.read.parquet(p)
    }
    val emb1 = stage("emb1", ScaleCorpus.amplifyEmbeddings(embBase, 1))
    val embN = stage(s"emb$factor", ScaleCorpus.amplifyEmbeddings(embBase, factor))

    // deterministic query sample: base ids < 20 in the first 5 copies
    val amplifiedPred = pmod(col("vec_id"), lit(IdShift)) < 20 &&
      (col("vec_id") / IdShift).cast("long") < 5

    /** Brute-force top-K truth for the sampled queries (query × corpus
      * — linear in corpus), operator-identical cosine + tie order. */
    def truthFor(emb: DataFrame, queryPred: Column): DataFrame = {
      val base = emb.select(col("vec_id").as("id"), col("embedding").as("v"))
      val q = base.filter(queryPred)
        .select(col("id").as("query_id"), col("v").as("qv"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id"))
      q.crossJoin(base.select(col("id").as("neighbor_id"), col("v").as("cv")))
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("cos", round(graft.functions.VectorFunctions
          .cosineNative(col("qv"), col("cv")), 6))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= K)
        .select(col("query_id"), col("neighbor_id"))
    }

    def score(leg: String, emb: DataFrame, truth: DataFrame,
        nCells: Int, nProbe: Int, queryPred: Column): Unit = {
      val t0 = System.nanoTime()
      val found = stage(s"found_${leg.replaceAll("[^A-Za-z0-9]", "_")}_${nCells}_$nProbe",
        Similarity.ivfTopK(emb, k = K, nCells = nCells, nProbe = nProbe)
          .join(emb.filter(queryPred).select(col("vec_id").as("query_id")),
            Seq("query_id"), "left_semi"))
      val secs = (System.nanoTime() - t0) / 1e9
      val nTruth = truth.count()
      val nHit = found.select(col("query_id"), col("neighbor_id"))
        .join(truth, Seq("query_id", "neighbor_id"), "left_semi").count()
      System.err.println(f"[ivfrecall] $leg cells=$nCells probe=$nProbe " +
        f"recall@$K=${nHit.toDouble / nTruth}%.3f " +
        f"(truth=$nTruth) t=$secs%.1f s")
    }

    val truth1 = stage("truth1", truthFor(emb1, amplifiedPred))
    val truthN = stage("truthN", truthFor(embN, amplifiedPred))
    val n1 = emb1.count(); val nN = embN.count()
    val cells1 = Similarity.ivfCellsFor(n1)
    val cellsN = Similarity.ivfCellsFor(nN)
    System.err.println(s"[ivfrecall] n1=$n1 nN=$nN derived cells: $cells1 / $cellsN")

    score("1x gate-point", emb1, truth1, nCells = 8, nProbe = 2, amplifiedPred)
    score(s"1x derived", emb1, truth1, nCells = cells1, nProbe = 2, amplifiedPred)
    score(s"${factor}x derived", embN, truthN, nCells = cellsN, nProbe = 2,
      amplifiedPred)
    score(s"${factor}x derived probe8", embN, truthN, nCells = cellsN,
      nProbe = 8, amplifiedPred)

    // ---- planted-cluster legs: IVF's INTENDED regime — clustered
    // data, where cells align with real structure. The amplified
    // fixture above is near-uniform (nearest neighbors barely closer
    // than random): the known hard case for ANY space-partitioning
    // ANN, where recall decay under cell growth is the curse of
    // dimensionality, not a parameterization bug. The planted legs
    // separate the two stories.
    // ~1-in-24 sample spread across clusters (ids are cluster-major)
    val plantedPred = pmod(col("vec_id"), lit(97)) < 4
    for (nClusters <- Seq(50, 5000)) {
      val planted = stage(s"planted$nClusters",
        ScaleCorpus.plantedClusters(spark, nClusters = nClusters))
      val n = planted.count()
      val cells = Similarity.ivfCellsFor(n)
      val pTruth = stage(s"ptruth$nClusters", truthFor(planted, plantedPred))
      score(s"planted n=$n", planted, pTruth, nCells = cells, nProbe = 2,
        plantedPred)
      if (nClusters > 50) // the recovery knob at the scaled point
        score(s"planted n=$n probe4", planted, pTruth, nCells = cells,
          nProbe = 4, plantedPred)
    }

    spark.stop()
  }
}
