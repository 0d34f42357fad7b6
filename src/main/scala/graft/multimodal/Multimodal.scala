package graft.multimodal

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling for training-data pipelines — beyond-reference
  * (builder prompt): image/audio/video travel as opaque `binary` columns with
  * typed metadata; decode / feature-extract / frame-sample run as
  * partition-batched typed transforms.
  *
  * The codec is REAL for the formats the JDK ships decoders for (round 3):
  * `image/png` / `image/bmp` / `image/gif` / `image/jpeg` via `javax.imageio`
  * and `audio/wav` via `javax.sound.sampled` — actual byte-stream parsing,
  * not pseudo-metadata. Only mediaTypes with no JVM-native decoder (video,
  * compressed audio) fall back to a clearly-marked deterministic stub so the
  * pipeline shape stays total; swapping in a JNI/JavaCV decoder replaces only
  * that branch.
  */
object Multimodal {

  /** An opaque media record: the binary payload + declared type. */
  final case class MediaRecord(id: Long, media: Array[Byte], mediaType: String)

  /** Decoded metadata. For images: pixel dims + raster bands. For audio:
    * width = frame count, height = sample rate (Hz), channels = channels —
    * the same typed envelope, field mapping documented per modality.
    */
  final case class DecodedMedia(
      id: Long, mediaType: String, nBytes: Int,
      width: Int, height: Int, channels: Int)

  /** Fixed feature dimension for [[extractFeatures]]. */
  val FEATURE_DIM = 16

  /** Features accumulate integer sample sums (exact in any engine) and
    * divide once at the end, so the image features are bit-reproducible
    * cross-engine; a real embedding model would emit float32 and the gate
    * would drop to a rows-only check.
    */
  final case class MediaFeatures(id: Long, features: Array[Double])

  private val ImageTypes = Set("image/png", "image/bmp", "image/gif", "image/jpeg")

  /** Decode typed metadata from the payload bytes. `mapPartitions` batching
    * amortizes per-partition decoder setup (the expensive part with heavy
    * codecs); decode itself is per-record.
    */
  def decode(media: Dataset[MediaRecord]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // heavyweight codecs initialize once per partition here
      it.map(decodeOne)
    }
  }

  private[multimodal] def decodeOne(m: MediaRecord): DecodedMedia = m.mediaType match {
    case t if ImageTypes(t) =>
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(m.media))
      require(img != null, s"undecodable $t payload for id ${m.id}")
      DecodedMedia(m.id, m.mediaType, m.media.length,
        img.getWidth, img.getHeight, img.getRaster.getNumBands)
    case "audio/wav" =>
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(m.media))
      try DecodedMedia(m.id, m.mediaType, m.media.length,
        width = in.getFrameLength.toInt,
        height = in.getFormat.getSampleRate.toInt,
        channels = in.getFormat.getChannels)
      finally in.close()
    case _ =>
      // STUB for formats without a JVM-native decoder (video, compressed
      // audio): deterministic pseudo-metadata from the byte stream
      val n = m.media.length
      val first = if (n > 0) java.lang.Byte.toUnsignedInt(m.media(0)) else 0
      DecodedMedia(m.id, m.mediaType, n,
        width = 64 + n % 512,
        height = 64 + (n * 7) % 512,
        channels = 1 + first % 3)
  }

  /** Feature extraction. For images: REAL pixel statistics from the decoded
    * raster — feature k is the mean normalized sample value over the rows
    * with y ≡ k (mod FEATURE_DIM), all bands; integer sample sums, one
    * final division (cross-engine exact). For other types: rolling byte-sum
    * stub (stands in for an embedding model).
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        if (ImageTypes(m.mediaType)) {
          val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(m.media))
          require(img != null, s"undecodable ${m.mediaType} payload for id ${m.id}")
          val raster = img.getRaster
          val (w, h, nb) = (img.getWidth, img.getHeight, raster.getNumBands)
          val sums = new Array[Long](FEATURE_DIM)
          val counts = new Array[Long](FEATURE_DIM)
          var y = 0
          while (y < h) {
            val k = y % FEATURE_DIM
            var x = 0
            while (x < w) {
              var b = 0
              while (b < nb) {
                sums(k) += raster.getSample(x, y, b)
                counts(k) += 1
                b += 1
              }
              x += 1
            }
            y += 1
          }
          MediaFeatures(m.id, Array.tabulate(FEATURE_DIM)(k =>
            if (counts(k) == 0) 0.0 else sums(k).toDouble / (255.0 * counts(k))))
        } else {
          val f = new Array[Double](FEATURE_DIM)
          var i = 0
          while (i < m.media.length) {
            f(i % FEATURE_DIM) += java.lang.Byte.toUnsignedInt(m.media(i)) / 255.0
            i += 1
          }
          MediaFeatures(m.id, f)
        }
      }
    }
  }

  /** Deterministic synthetic PNG: pixel sample (x, y, band) =
    * (31x + 7y + 13·id + 11·band) mod 256, grayscale (1 band) or RGB
    * (3 bands). PNG is lossless, so a decode reads back exactly these
    * samples — used by the gate queries and specs to exercise the REAL
    * codec path with oracle-computable content.
    */
  def syntheticPng(id: Long, width: Int, height: Int, gray: Boolean): Array[Byte] = {
    val imgType = if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
      else java.awt.image.BufferedImage.TYPE_3BYTE_BGR
    val img = new java.awt.image.BufferedImage(width, height, imgType)
    val raster = img.getRaster
    val nb = raster.getNumBands
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        var b = 0
        while (b < nb) {
          raster.setSample(x, y, b, ((31 * x + 7 * y + 13 * id + 11 * b) % 256).toInt)
          b += 1
        }
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Deterministic frame sampling plan for a video payload: byte offsets of
    * every k-th "frame" (stub: fixed frame stride derived from payload size).
    */
  def frameSampleOffsets(df: DataFrame, mediaCol: String, everyK: Int): DataFrame = {
    val n = length(col(mediaCol))
    val stride = greatest(n / 16, lit(1)) * everyK
    df.withColumn("frame_offsets",
      filter(transform(sequence(lit(0), lit(15)), i => i * stride),
        o => o < n))
  }
}
