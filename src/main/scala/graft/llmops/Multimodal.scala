package graft.llmops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque binary
  * payloads with typed metadata, batch-shaped decode / feature-extract /
  * resize / frame-sample stages.
  *
  * The decode kernels are STUBS (deterministic fakes): no image/audio
  * codecs ship in this container. Everything around them — schema,
  * partition-level batching, column shapes, null handling — is the real
  * Spark plumbing a production pipeline would keep while swapping the
  * kernel for an actual decoder (e.g. a JNI libjpeg call or a Python
  * worker via Arrow batches).
  *
  * Scale design: payloads stay in executor-side binary columns end to
  * end (never collected); decode runs per partition with bounded batch
  * memory; metadata-only queries prune the payload column at the scan.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
      declared_w: Int, declared_h: Int)
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
      width: Int, height: Int, mean_intensity: Double, phash: Long)

  /** Deterministic synthetic media corpus derived from a seed column —
    * payload bytes are a keyed hash stream (stands in for real encoded
    * frames; STUB). */
  def synthCorpus(spark: SparkSession, n: Int, seed: Long = 42): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val rnd = new scala.util.Random(seed ^ i)
      val kind = Seq("image", "audio", "video")((i % 3).toInt)
      val w = 16 + (i % 8).toInt * 16
      val h = 16 + (i % 5).toInt * 16
      val payload = Array.fill((w * h / 8).max(64))(rnd.nextInt().toByte)
      MediaRow(i, kind, payload, w, h)
    }
  }

  /** ??? real decoder goes here — STUB: derives "pixels" statistics
    * from the payload bytes deterministically. Mirrors the signature a
    * real decode would have: bytes → (width, height, intensity stats,
    * perceptual hash). */
  private def decodeStub(r: MediaRow): MediaFeatures = {
    val bytes = r.payload
    var sum = 0L; var ph = 1125899906842597L // FNV-ish accumulator
    var i = 0
    while (i < bytes.length) {
      sum += (bytes(i) & 0xFF)
      ph = ph * 31 + (bytes(i) & 0xFF)
      i += 1
    }
    MediaFeatures(r.media_id, r.kind, bytes.length, r.declared_w,
      r.declared_h, math.rint(sum.toDouble / bytes.length * 100) / 100, ph)
  }

  /** Partition-batched decode: the real pattern — iterate the partition
    * in bounded groups so a native decoder could amortize setup per
    * batch (the Arrow/pandas batch shape), emit typed features. */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch "decoder init" would happen here
        batch.iterator.map(decodeStub)
      }
    }
  }

  /** Metadata-only projection — payload column pruned at the scan. */
  def metadataOnly(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("kind"),
      col("declared_w"), col("declared_h"))

  /** Frame sampling for video rows: every k-th "frame" offset of the
    * payload (STUB: slices the byte stream; the slice boundaries and
    * explode shape are the real plumbing). */
  def sampleFrames(media: Dataset[MediaRow], everyK: Int = 4): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      val frameSize = 64
      val nFrames = r.payload.length / frameSize
      (0 until nFrames by everyK).map { f =>
        val frame = r.payload.slice(f * frameSize, (f + 1) * frameSize)
        (r.media_id, f, frame.length,
          frame.foldLeft(0L)((a, b) => a + (b & 0xFF)))
      }
    }.toDF("media_id", "frame_idx", "frame_bytes", "frame_checksum")
  }
}
