package graft.llmops

import graft.sources.Snapshots
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted ANN design point + bucket index (r15, VERDICT r14 #6).
  *
  * The derived sign-LSH parameters (occupancy planes, the measured
  * design cosine, the recall-holding table count) and the bucket index
  * itself are session-memoized but recomputed per driver — production
  * serving re-pays the design probe and the full hash pass on every
  * restart. This writes both through the engine's create-if-missing
  * snapshot seam ([[graft.sources.Snapshots.loadOrCreate]] — the
  * reference's memoization pattern, reference:
  * src/main/scala/ws/vinta/albedo/utils/ModelUtils.scala:7-21 and
  * DatasetUtils.scala:36-50), so a cold session loads the identical
  * index from parquet instead of refitting.
  *
  * KEYING / STALENESS CONTRACT: the snapshot name folds in
  *  - `corpusVersion` — the caller's data-version handle (the
  *    reference keyed snapshots by date; here it is an explicit
  *    parameter, SURVEY §7.4), and
  *  - the analyzed plan's semanticHash + the resolved input-file
  *    fingerprint ([[graft.ops.PlanFingerprint]]) — so a corpus
  *    REWRITTEN in place (new part files) produces a new key even
  *    under an unchanged version string, and two different corpora can
  *    never alias one index.
  * An input overwritten with byte-identical FILE NAMES under the same
  * version is outside the contract (same as the repo's other memos);
  * delete the snapshot directory or bump `corpusVersion` when doing
  * surgery like that. Parameters and buckets are written under the
  * SAME key by construction, so they can never mix across versions.
  *
  * Scale: the params snapshot is one row; the bucket index is
  * n·tables narrow rows (id, tbl, bucket) — parquet-compressed longs,
  * read back with partition parallelism. Search through a loaded index
  * is [[Similarity.selfTopKFromBuckets]] — the same single
  * implementation the computed path uses. */
object AnnIndexSnapshot {

  /** `createdParams`/`createdBuckets` are single-driver diagnostics
    * (the spec's reuse proof): they come from an existence pre-check,
    * so a CONCURRENT driver creating the same snapshot between check
    * and load can skew them — the loaded data itself is still correct
    * (loadOrCreate is last-writer-wins over deterministic bytes). */
  final case class LshIndex(planes: Int, tables: Int, designCosMilli: Int,
      buckets: DataFrame, createdParams: Boolean, createdBuckets: Boolean)

  /** Snapshot key: plan identity + input-file identity + every input
    * of the persisted derivation — k, dim (bucket bits depend on the
    * hashed dimensionality), and the engine design constants the
    * params bake in (occupancy target, recall target, probe radius —
    * [[Similarity.TopKProbeRadius]], the r16 derived default).
    * Folding the constants in means RETUNING them in a later engine
    * version invalidates old snapshots by key instead of silently
    * serving a design point derived under the old targets (r15
    * review) — the r15→r16 radius flip itself retires every r0-keyed
    * snapshot this way; dim in the key means two dims over the same
    * corpus can never alias one bucket index. */
  def indexKey(vectors: DataFrame, k: Int, dim: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): String = {
    val planHash = vectors.select(col(idCol), col(vecCol))
      .queryExecution.analyzed.semanticHash()
    val fp = graft.ops.PlanFingerprint.inputFingerprint(vectors)
    // semanticHash can be negative — hex of the raw bits keeps the
    // name filesystem-safe. `dq1` is the derivation-version tag (r17:
    // the whole probe + table chain went integer-quantized, so
    // float-era snapshots retire by key).
    f"${planHash}%08x_${fp.take(16)}_k${k}_d${dim}_occ${
      Similarity.TopKOccupancy}_tr${
      Similarity.TopKTargetRecallPpm}_r${
      Similarity.TopKProbeRadius}_dq1"
  }

  /** Load the persisted top-k LSH index for this (corpus, k), deriving
    * and persisting it on first use: the zero-knob design point
    * ([[Similarity.autoPlanes]] at [[Similarity.TopKOccupancy]],
    * [[Similarity.topKDesignCosMilli]], [[Similarity.lshTablesFor]] at
    * [[Similarity.TopKTargetRecallPpm]]) plus the portable (id, tbl,
    * bucket) assignment. Deterministic end to end, so a re-created
    * snapshot is byte-identical to the one it replaces. */
  def lshTopKIndex(vectors: DataFrame, k: Int, dim: Int, baseDir: String,
      corpusVersion: String, idCol: String = "vec_id",
      vecCol: String = "embedding"): LshIndex = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val key = indexKey(vectors, k, dim, idCol, vecCol)
    val paramsName = s"ann_lsh_params_$key"
    val bucketsName = s"ann_lsh_buckets_$key"
    val hadParams = snapshotExists(spark, baseDir, corpusVersion, paramsName)
    val params = Snapshots.loadOrCreate(spark, baseDir, corpusVersion,
        paramsName) {
      val planes = Similarity.autoPlanes(vectors, Similarity.TopKOccupancy)
      val design = Similarity.topKDesignCosMilli(vectors, k, idCol, vecCol)
      val tables = Similarity.lshTablesFor(planes, design,
        Similarity.TopKTargetRecallPpm, Similarity.TopKProbeRadius)
      Seq((planes, tables, design)).toDF("planes", "tables", "design_cos_milli")
    }
    val row = params.head()
    val planes = row.getAs[Int]("planes")
    val tables = row.getAs[Int]("tables")
    val design = row.getAs[Int]("design_cos_milli")
    val hadBuckets = snapshotExists(spark, baseDir, corpusVersion, bucketsName)
    val buckets = Snapshots.loadOrCreate(spark, baseDir, corpusVersion,
        bucketsName) {
      Similarity.portableBuckets(vectors, planes, dim, tables, idCol, vecCol)
    }
    LshIndex(planes, tables, design, buckets,
      createdParams = !hadParams, createdBuckets = !hadBuckets)
  }

  /** Self-top-k search through a (possibly loaded) index — the exact
    * candidate/re-rank tail the computed path runs
    * ([[Similarity.selfTopKFromBuckets]] at the engine's derived probe
    * radius — the bucket index is radius-independent, masks expand the
    * query side at search time): only the bucket PASS is skipped on a
    * warm snapshot; vectors are still read for the final exact-cosine
    * re-rank. */
  def lshTopKWithIndex(vectors: DataFrame, index: LshIndex, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val base = vectors.select(col(idCol).as("id"), col(vecCol).as("v"))
    Similarity.selfTopKFromBuckets(base, index.buckets, k,
      Similarity.TopKProbeRadius, index.planes)
  }

  // ---- IVF family (r15, NOTES debt #3) ----------------------------

  final case class IvfIndex(centers: DataFrame, assigned: DataFrame,
      createdCenters: Boolean, createdAssigned: Boolean)

  /** Persisted IVF index: the seeded-KMeans centroid routing table
    * (nCells tiny rows — the broadcast side) and the one-time corpus
    * cell assignment (the expensive n-row artifact a 100 TB serving
    * restart must not recompute). Same keying/staleness contract as
    * the LSH snapshot; the fit parameters (cells, seed) are in the
    * key. A PARTIAL snapshot (one of the two names missing — e.g. a
    * killed first run) is treated as ABSENT: the seeded KMeans fit is
    * layout-sensitive (the round-robin `repartition(8)` feeding the
    * fit makes float aggregation order — and hence the centroids —
    * depend on the input's initial split layout, ADVICE r15 #1), so a
    * surviving half from a killed run is NOT trusted to match a refit
    * under today's reader layout; both artifacts are recreated from
    * ONE fit and the survivor is atomically replaced if its bytes
    * drifted ([[graft.sources.Snapshots.publish]] make-equal). */
  def ivfIndex(vectors: DataFrame, nCells: Int, baseDir: String,
      corpusVersion: String, seed: Long = 42,
      idCol: String = "vec_id", vecCol: String = "embedding"): IvfIndex = {
    val spark = vectors.sparkSession
    val planHash = vectors.select(col(idCol), col(vecCol))
      .queryExecution.analyzed.semanticHash()
    val fp = graft.ops.PlanFingerprint.inputFingerprint(vectors)
    // `fit2` is the fit-discipline tag (ADVICE r16 #3): the r16 layout
    // pin (repartition(8, id) + sortWithinPartitions in ivfFit) changed
    // the fitted centroids for identical inputs, so pre-pin snapshots
    // must retire BY KEY — matching the LSH key, which already folds
    // its design constants for exactly this reason. Bump the tag
    // whenever the fit discipline changes the fitted model for
    // unchanged (data, seed).
    val key = f"${planHash}%08x_${fp.take(16)}_c${nCells}_s${seed}_fit2"
    val centersName = s"ann_ivf_centers_$key"
    val assignedName = s"ann_ivf_assigned_$key"
    val centersPath = Snapshots.path(baseDir, corpusVersion, centersName)
    val assignedPath = Snapshots.path(baseDir, corpusVersion, assignedName)
    val hadCenters = snapshotExists(spark, baseDir, corpusVersion, centersName)
    val hadAssigned = snapshotExists(spark, baseDir, corpusVersion, assignedName)
    if (!(hadCenters && hadAssigned)) {
      // cold or partial: one fit produces BOTH artifacts, so they can
      // never pair a persisted half with a differently-fit other half
      val fitted =
        Similarity.ivfFit(vectors, nCells, seed, idCol, vecCol, memoKey = None)
      Snapshots.publish(Similarity.ivfCentersDf(spark, fitted._1),
        centersPath)
      Snapshots.publish(
        fitted._1.transform(fitted._2).select(col("id"), col("v"), col("cell")),
        assignedPath)
    }
    IvfIndex(spark.read.parquet(centersPath), spark.read.parquet(assignedPath),
      createdCenters = !hadCenters, createdAssigned = !hadAssigned)
  }

  /** Search through a (possibly loaded) IVF index — the exact probe/
    * re-rank tail [[Similarity.ivfTopK]] runs. */
  def ivfTopKWithIndex(index: IvfIndex, k: Int, nProbe: Int): DataFrame =
    Similarity.ivfSearchFromIndex(index.assigned, index.centers, k, nProbe)

  // ---- PQ family (r15, NOTES debt #3) -----------------------------

  final case class PqIndex(codebook: DataFrame, codes: DataFrame,
      createdCodebook: Boolean, createdCodes: Boolean)

  /** Persisted PQ artifacts: the m×k codebook (tiny — the broadcast
    * side of every ADC scan) and the encoded corpus codes (the n·m-row
    * compressed index — at 100 TB the entire point is that THESE, not
    * the float vectors, are what serving reads). Keyed like the other
    * families with the training parameters folded in. Partial
    * snapshots re-encode from the persisted codebook — cheap and
    * exactly consistent (encoding is a deterministic function of
    * codebook + corpus). */
  def pqIndex(vectors: DataFrame, m: Int, dim: Int, kCentroids: Int,
      iters: Int, baseDir: String, corpusVersion: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): PqIndex = {
    import graft.llmops.{ProductQuantization => PQ}
    val spark = vectors.sparkSession
    import spark.implicits._
    val planHash = vectors.select(col(idCol), col(vecCol))
      .queryExecution.analyzed.semanticHash()
    val fp = graft.ops.PlanFingerprint.inputFingerprint(vectors)
    val key = f"${planHash}%08x_${fp.take(16)}_m${m}_d${dim}_k${kCentroids}_i$iters"
    val bookName = s"ann_pq_codebook_$key"
    val codesName = s"ann_pq_codes_$key"
    val hadBook = snapshotExists(spark, baseDir, corpusVersion, bookName)
    val hadCodes = snapshotExists(spark, baseDir, corpusVersion, codesName)
    val codebook = Snapshots.loadOrCreate(spark, baseDir, corpusVersion,
      bookName)(
      PQ.train(vectors, m, dim, kCentroids, iters, idCol, vecCol).toDF())
    val codes = Snapshots.loadOrCreate(spark, baseDir, corpusVersion,
      codesName)(PQ.encode(vectors, codebook, m, dim, idCol, vecCol))
    PqIndex(codebook, codes,
      createdCodebook = !hadBook, createdCodes = !hadCodes)
  }

  private def snapshotExists(spark: SparkSession, baseDir: String,
      corpusVersion: String, name: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(
      Snapshots.path(baseDir, corpusVersion, name))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
}
