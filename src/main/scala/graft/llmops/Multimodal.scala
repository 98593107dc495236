package graft.llmops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Multimodal column plumbing: image/audio/video as opaque binary
  * payloads with typed metadata, batch-shaped decode / feature-extract /
  * resize / frame-sample stages.
  *
  * IMAGE rows carry REAL PNG bytes (encoded with the JDK's
  * javax.imageio, which ships in this container) and are REALLY decoded
  * back to width/height/intensity/perceptual-hash in the batched
  * kernel. Audio/video decode kernels remain STUBS (deterministic
  * fakes — no audio/video codecs offline); the plumbing around them —
  * schema, partition-level batching, column shapes — is the production
  * shape either way.
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

  /** Deterministic PNG: gradient + seeded noise, encoded with the JDK
    * codec — real bytes, real decode on the other side. */
  private[llmops] def encodePng(w: Int, h: Int, seed: Long): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val rnd = new scala.util.Random(seed)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = math.min(255, x * 255 / w + rnd.nextInt(32))
        val g = y * 255 / h
        val b = (x + y) * 255 / (w + h)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic synthetic media corpus derived from a seed column.
    * Image payloads are real PNGs; audio/video payloads are keyed hash
    * streams (STUB — no codecs for those offline). */
  def synthCorpus(spark: SparkSession, n: Int, seed: Long = 42): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val rnd = new scala.util.Random(seed ^ i)
      val kind = Seq("image", "audio", "video")((i % 3).toInt)
      val w = 16 + (i % 8).toInt * 16
      val h = 16 + (i % 5).toInt * 16
      val payload =
        if (kind == "image") encodePng(w, h, seed ^ i)
        else Array.fill((w * h / 8).max(64))(rnd.nextInt().toByte)
      MediaRow(i, kind, payload, w, h)
    }
  }

  /** REAL image decode: PNG bytes → (width, height, mean gray
    * intensity, 64-bit average-hash). The aHash is the classic
    * perceptual hash: 8×8 block means thresholded by the global mean. */
  private def decodeImage(r: MediaRow): MediaFeatures = {
    val img = ImageIO.read(new ByteArrayInputStream(r.payload))
    val w = img.getWidth
    val h = img.getHeight
    // one pass: global mean gray + 8×8 block sums for the aHash
    val blockSum = new Array[Long](64)
    val blockCnt = new Array[Long](64)
    var total = 0L
    var y = 0
    while (y < h) {
      var x = 0
      val by = math.min(7, y * 8 / h)
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val gray = (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / 3
        total += gray
        val bi = by * 8 + math.min(7, x * 8 / w)
        blockSum(bi) += gray
        blockCnt(bi) += 1
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    val mean = total.toDouble / n
    var phash = 0L
    var b = 0
    while (b < 64) {
      if (blockCnt(b) > 0 && blockSum(b).toDouble / blockCnt(b) > mean)
        phash |= (1L << b)
      b += 1
    }
    MediaFeatures(r.media_id, r.kind, r.payload.length, w, h,
      math.rint(mean * 100) / 100, phash)
  }

  /** ??? real audio/video decoder goes here — STUB: derives "sample"
    * statistics from the payload bytes deterministically. Mirrors the
    * signature a real decode would have. */
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

  /** Partition-batched decode: iterate the partition in bounded groups
    * so a native decoder could amortize setup per batch (the
    * Arrow/pandas batch shape), emit typed features. Images go through
    * the REAL PNG decode; audio/video through the stub. */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch "decoder init" would happen here
        batch.iterator.map { r =>
          if (r.kind == "image") decodeImage(r) else decodeStub(r)
        }
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
