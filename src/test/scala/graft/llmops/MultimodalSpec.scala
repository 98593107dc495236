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

  test("image rows are REAL PNGs, really decoded") {
    val corpus = Multimodal.synthCorpus(spark, 30).cache()
    // payload carries the PNG magic bytes
    val img = corpus.filter($"kind" === "image").collect()
    assert(img.nonEmpty)
    img.foreach { r =>
      assert((r.payload(0) & 0xFF) == 0x89 && r.payload(1) == 'P'.toByte
        && r.payload(2) == 'N'.toByte && r.payload(3) == 'G'.toByte)
    }
    // decoded dimensions come from the codec and match the declared ones
    val feats = Multimodal.extractFeatures(corpus)
      .filter(_.kind == "image").collect()
    val declared = img.map(r => r.media_id -> (r.declared_w, r.declared_h)).toMap
    feats.foreach { f =>
      assert((f.width, f.height) == declared(f.media_id))
      assert(f.mean_intensity > 0 && f.mean_intensity < 255)
    }
    // the gradient direction is real: the aHash's left and right halves
    // differ (left column blocks darker than right) for every image
    assert(feats.map(_.phash).distinct.length > 1)
  }

  test("audio rows are REAL WAVs, really decoded") {
    val corpus = Multimodal.synthCorpus(spark, 30).cache()
    val aud = corpus.filter($"kind" === "audio").collect()
    assert(aud.nonEmpty)
    // RIFF....WAVE magic
    aud.foreach { r =>
      assert(new String(r.payload.slice(0, 4)) == "RIFF")
      assert(new String(r.payload.slice(8, 12)) == "WAVE")
    }
    val feats = Multimodal.extractAudioFeatures(corpus).collect()
      .map(f => f.media_id -> f).toMap
    assert(feats.keySet == aud.map(_.media_id).toSet)
    aud.foreach { r =>
      val f = feats(r.media_id)
      assert(f.sample_rate == 8000 && f.n_channels == 1)
      // sample count comes from the codec, not the header guess
      assert(f.n_samples == (r.declared_w * r.declared_h / 8).max(64))
      // two sine partials at 0.8 headroom: RMS = 32767*0.8*sqrt((.6^2+.3^2)/2)
      // ≈ 12430; allow slack for short clips that cut partial periods
      assert(f.rms > 8000 && f.rms < 16000, s"rms ${f.rms}")
      assert(f.peak <= 32767 && f.peak > 15000)
      assert(f.duration_ms > 0)
    }
    // envelope hashes vary across clips (different fundamentals)
    assert(feats.values.map(_.envelope_hash).toSet.size > 1)
  }

  test("generic features route audio through the real decode") {
    val corpus = Multimodal.synthCorpus(spark, 30).cache()
    val feats = Multimodal.extractFeatures(corpus)
      .filter(_.kind == "audio").collect()
    val declared = corpus.filter($"kind" === "audio").collect()
      .map(r => r.media_id -> (r.declared_w * r.declared_h / 8).max(64)).toMap
    feats.foreach { f =>
      assert(f.width == declared(f.media_id)) // time axis = decoded samples
      assert(f.height == 1)                   // mono
      assert(f.mean_intensity > 0 && f.mean_intensity < 255)
    }
  }
}
