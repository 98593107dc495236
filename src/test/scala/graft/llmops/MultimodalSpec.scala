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

  test("image resize: image rows only, identity-size resize preserves " +
      "the mean, deterministic thumbnails") {
    val corpus = Multimodal.synthCorpus(spark, 24)
    val out = Multimodal.resizeImages(corpus, 8, 8).collect()
    // images are media_id % 3 == 0
    assert(out.map(_.getLong(0)).forall(_ % 3 == 0) && out.length == 8)
    out.foreach { r =>
      assert(r.getInt(3) == 8 && r.getInt(4) == 8)
      val m = r.getDouble(5)
      assert(m >= 0 && m <= 255, s"thumb mean $m out of range")
    }
    // identity resize (out dims == src dims) must reproduce the decode
    // path's exact mean gray for a same-size image
    val one = corpus.filter(_.media_id == 0).cache()
    val feats = Multimodal.extractFeatures(one).collect().head
    val ident = Multimodal.resizeImages(one, feats.width, feats.height)
      .collect().head
    assert(ident.getDouble(5) == feats.mean_intensity,
      s"identity resize mean ${ident.getDouble(5)} != decode mean " +
        s"${feats.mean_intensity}")
    // determinism: same corpus, same fold
    val again = Multimodal.resizeImages(Multimodal.synthCorpus(spark, 24), 8, 8)
      .collect().map(r => (r.getLong(0), r.getLong(6))).toSet
    assert(again == out.map(r => (r.getLong(0), r.getLong(6))).toSet)
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

  test("video rows are REAL GVID streams of PNG frames, really decoded") {
    val corpus = Multimodal.synthCorpus(spark, 30).cache()
    val vids = corpus.filter($"kind" === "video").collect()
    assert(vids.nonEmpty)
    // container magic + every frame carries the PNG signature
    vids.foreach { r =>
      assert(r.payload(0) == 'G'.toByte && r.payload(1) == 'V'.toByte
        && r.payload(2) == 'I'.toByte && r.payload(3) == 'D'.toByte)
    }
    // frame dims come from the PNG codec, not the metadata: declared
    // dims are the logical size, frames are encoded at half (min 8)
    val frames = Multimodal.sampleFrames(corpus, everyK = 1).collect()
    val declared = vids.map(r => r.media_id -> (r.declared_w, r.declared_h)).toMap
    assert(frames.nonEmpty)
    frames.foreach { f =>
      val (dw, dh) = declared(f.getAs[Long]("media_id"))
      assert(f.getAs[Int]("frame_w") == (dw / 2).max(8))
      assert(f.getAs[Int]("frame_h") == (dh / 2).max(8))
      val g = f.getAs[Double]("frame_mean_gray")
      assert(g > 0 && g < 255)
    }
    // frame content varies with the index (seeded "motion"): a video's
    // frames don't all share one aHash
    val perVid = frames.groupBy(_.getAs[Long]("media_id"))
    assert(perVid.values.exists(_.map(_.getAs[Long]("frame_ahash")).distinct.length > 1))
  }

  test("GVID encode/decode round-trip is lossless on frame count and " +
      "stride skips undecoded frames") {
    val payload = Multimodal.encodeVideo(nFrames = 10, w = 16, h = 12, seed = 7L)
    val all = Multimodal.videoFrames(payload).toArray
    assert(all.length == 10)
    assert(all.forall { case (_, _, img) =>
      img.getWidth == 16 && img.getHeight == 12 })
    val strided = Multimodal.videoFrames(payload, everyK = 3).toArray
    assert(strided.map(_._1).toSeq == Seq(0, 3, 6, 9))
    // deterministic: same seed, same bytes
    assert(java.util.Arrays.equals(payload,
      Multimodal.encodeVideo(10, 16, 12, 7L)))
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
