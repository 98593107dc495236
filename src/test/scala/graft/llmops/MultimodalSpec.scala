package graft.llmops

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("feature extraction is deterministic and schema-stable") {
    val a = Multimodal.extractFeatures(Multimodal.synthCorpus(spark, 100))
      .collect().sortBy(_.media_id)
    val b = Multimodal.extractFeatures(Multimodal.synthCorpus(spark, 100))
      .collect().sortBy(_.media_id)
    assert(a.toSeq == b.toSeq)
    assert(a.length == 100)
    val f = a.head
    assert(f.n_bytes > 0 && f.mean_intensity >= 0 && f.mean_intensity <= 255)
  }

  test("frame sampling only emits video rows at the configured stride") {
    val corpus = Multimodal.synthCorpus(spark, 60).cache()
    val frames = Multimodal.sampleFrames(corpus, everyK = 4)
    val kinds = corpus.filter($"kind" === "video").select("media_id")
      .as[Long].collect().toSet
    val got = frames.select("media_id").distinct().as[Long].collect().toSet
    assert(got.subsetOf(kinds))
    val strides = frames.select("frame_idx").distinct().as[Int].collect()
    assert(strides.forall(_ % 4 == 0))
  }

  test("metadata-only projection prunes the payload column") {
    val meta = Multimodal.metadataOnly(Multimodal.synthCorpus(spark, 10).toDF())
    assert(!meta.columns.contains("payload"))
  }
}
