package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling for training-data pipelines — beyond-reference
  * (builder prompt): image/audio/video travel as opaque `binary` columns with
  * typed metadata; decode / feature-extract / frame-sample run as
  * partition-batched typed transforms.
  *
  * The actual codec calls are STUBBED (this container has no image/audio
  * libraries): `decodeStub` derives deterministic pseudo-metadata from the
  * byte stream. Everything around the stub — schema, encoders, partition
  * batching, plumbing — is real and tested, so swapping in a JNI/JavaCV
  * decoder is a one-function change.
  */
object Multimodal {

  /** An opaque media record: the binary payload + declared type. */
  final case class MediaRecord(id: Long, media: Array[Byte], mediaType: String)

  /** Decoded metadata (what a real image decoder would emit). */
  final case class DecodedMedia(
      id: Long, mediaType: String, nBytes: Int,
      width: Int, height: Int, channels: Int)

  /** Fixed feature dimension for the extract stub. */
  val FEATURE_DIM = 16

  /** Features accumulate in Double so the stub's arithmetic is exactly
    * replicable cross-engine (DuckDB has no float32 math); a real embedding
    * model would emit float32 and the gate would drop to a rows-only check.
    */
  final case class MediaFeatures(id: Long, features: Array[Double])

  /** STUB decode: deterministic pseudo-dimensions from the payload bytes —
    * width/height from byte length, channels from the first byte. A real
    * implementation replaces ONLY the body of `decodeOne`; the
    * `mapPartitions` batching (amortizing per-partition decoder init, the
    * expensive part with real codecs) stays as is.
    */
  def decode(media: Dataset[MediaRecord]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real codecs initialize a decoder once per partition here
      it.map(decodeOne)
    }
  }

  private[multimodal] def decodeOne(m: MediaRecord): DecodedMedia = {
    val n = m.media.length
    val first = if (n > 0) java.lang.Byte.toUnsignedInt(m.media(0)) else 0
    DecodedMedia(m.id, m.mediaType, n,
      width = 64 + n % 512,
      height = 64 + (n * 7) % 512,
      channels = 1 + first % 3)
  }

  /** STUB feature extraction: FEATURE_DIM floats from a rolling byte sum —
    * stands in for an embedding model; partition-batched like `decode`.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
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
