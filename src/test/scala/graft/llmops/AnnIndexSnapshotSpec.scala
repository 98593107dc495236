package graft.llmops

import graft.SparkSpec

/** Persisted ANN design point (r15, VERDICT r14 #6): a cold session
  * must REUSE the snapshot bit-identically instead of re-paying the
  * design probe and the hash pass, and search through the loaded index
  * must equal the computed zero-knob operator exactly. */
class AnnIndexSnapshotSpec extends SparkSpec {

  test("cold session loads the persisted index bit-identically and " +
      "does not recompute; index search == computed zero-knob search") {
    import spark.implicits._
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val root = java.nio.file.Files
      .createTempDirectory("ann-index-snap").toString

    // first use: both snapshot pieces are created
    val idx1 = AnnIndexSnapshot.lshTopKIndex(emb, k = 5, dim = 64,
      baseDir = root, corpusVersion = "v1")
    assert(idx1.createdParams && idx1.createdBuckets)
    val buckets1 = idx1.buckets.as[(Long, Int, Long)].collect().toSet

    // cold session: fresh session state (the design-cos and model
    // memos are keyed by session OBJECT, so nothing in-memory can
    // satisfy this call) — the snapshot must be loaded, not recreated
    val cold = spark.newSession()
    val embCold = graft.sources.Tables.embeddings(cold, sf0001)
    val idx2 = AnnIndexSnapshot.lshTopKIndex(embCold, k = 5, dim = 64,
      baseDir = root, corpusVersion = "v1")
    assert(!idx2.createdParams, "cold session recreated the params snapshot")
    assert(!idx2.createdBuckets, "cold session recreated the bucket snapshot")
    assert(idx2.planes == idx1.planes && idx2.tables == idx1.tables
      && idx2.designCosMilli == idx1.designCosMilli)
    val buckets2 = idx2.buckets
      .as[(Long, Int, Long)](org.apache.spark.sql.Encoders.product)
      .collect().toSet
    assert(buckets2 == buckets1, "persisted bucket index drifted")

    // search through the loaded index == the computed operator
    val viaIndex = AnnIndexSnapshot.lshTopKWithIndex(embCold, idx2, k = 5)
      .collect().map(_.toSeq).toSet
    val computed = Similarity.lshTopKPortable(embCold, k = 5, dim = 64)
      .collect().map(_.toSeq).toSet
    assert(viaIndex == computed,
      "index-backed search diverges from the computed zero-knob operator")

    // a DIFFERENT corpus version is a different key — created fresh
    val idx3 = AnnIndexSnapshot.lshTopKIndex(embCold, k = 5, dim = 64,
      baseDir = root, corpusVersion = "v2")
    assert(idx3.createdParams && idx3.createdBuckets)

    // a different dim over the SAME corpus is a different key (r15
    // review: buckets depend on the hashed dimensionality)
    val idx4 = AnnIndexSnapshot.lshTopKIndex(embCold, k = 5, dim = 32,
      baseDir = root, corpusVersion = "v1")
    assert(idx4.createdParams && idx4.createdBuckets,
      "dim-32 index aliased the dim-64 snapshot")
  }

  test("IVF + PQ snapshots (r15 debt #3): cold session loads both " +
      "families' artifacts without refitting; searches match computed") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val root = java.nio.file.Files
      .createTempDirectory("ann-ivfpq-snap").toString

    val ivf1 = AnnIndexSnapshot.ivfIndex(emb, nCells = 8,
      baseDir = root, corpusVersion = "v1")
    assert(ivf1.createdCenters && ivf1.createdAssigned)
    val pq1 = AnnIndexSnapshot.pqIndex(emb, m = 8, dim = 64,
      kCentroids = 16, iters = 5, baseDir = root, corpusVersion = "v1")
    assert(pq1.createdCodebook && pq1.createdCodes)

    val cold = spark.newSession()
    val embCold = graft.sources.Tables.embeddings(cold, sf0001)
    val ivf2 = AnnIndexSnapshot.ivfIndex(embCold, nCells = 8,
      baseDir = root, corpusVersion = "v1")
    assert(!ivf2.createdCenters && !ivf2.createdAssigned,
      "cold session refit the IVF index")
    val pq2 = AnnIndexSnapshot.pqIndex(embCold, m = 8, dim = 64,
      kCentroids = 16, iters = 5, baseDir = root, corpusVersion = "v1")
    assert(!pq2.createdCodebook && !pq2.createdCodes,
      "cold session retrained the PQ codebook")

    // loaded artifacts are bit-identical to the created ones
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(ivf2.centers) == rows(ivf1.centers))
    assert(rows(ivf2.assigned) == rows(ivf1.assigned))
    assert(rows(pq2.codebook) == rows(pq1.codebook))
    assert(rows(pq2.codes) == rows(pq1.codes))

    // index-backed IVF search == the computed operator at the same
    // (cells, probe, seed) point — same seeded fit, same search tail
    val viaIndex = rows(AnnIndexSnapshot.ivfTopKWithIndex(ivf2, k = 5,
      nProbe = 2))
    val computed = rows(Similarity.ivfTopK(embCold, k = 5, nCells = 8,
      nProbe = 2))
    assert(viaIndex == computed,
      "IVF index-backed search diverges from the computed operator")
  }

  test("staleness contract: an in-place corpus REWRITE (new part files " +
      "behind the same path and version) misses the key and re-creates") {
    val root = java.nio.file.Files
      .createTempDirectory("ann-index-stale").toString
    val corpusPath = s"$root/corpus"
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    emb.write.mode("overwrite").parquet(corpusPath)
    val v1 = spark.read.parquet(corpusPath)
    val idx1 = AnnIndexSnapshot.lshTopKIndex(v1, k = 5, dim = 64,
      baseDir = root, corpusVersion = "v1")
    assert(idx1.createdParams && idx1.createdBuckets)

    // rewrite the SAME path with different content (half the corpus);
    // the parquet overwrite produces fresh part-file names, so the
    // input fingerprint moves even though path + version + schema and
    // the analyzed plan's semanticHash (same path ⇒ same plan) do not
    emb.filter(org.apache.spark.sql.functions.col("vec_id") < 250)
      .write.mode("overwrite").parquet(corpusPath)
    val v2 = spark.read.parquet(corpusPath)
    val idx2 = AnnIndexSnapshot.lshTopKIndex(v2, k = 5, dim = 64,
      baseDir = root, corpusVersion = "v1")
    assert(idx2.createdParams && idx2.createdBuckets,
      "rewritten corpus was served the stale snapshot — the fingerprint " +
        "did not move")
    assert(idx2.buckets.count() != idx1.buckets.count(),
      "fresh index does not reflect the rewritten corpus")
  }
}
