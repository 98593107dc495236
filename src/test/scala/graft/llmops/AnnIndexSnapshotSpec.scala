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
      && idx2.designCos == idx1.designCos)
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
  }
}
