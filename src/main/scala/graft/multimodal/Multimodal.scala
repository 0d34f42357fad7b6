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

  /** Decoded metadata. For images: pixel dims + raster bands (durationMs 0).
    * For audio: width = frame count, height = sample rate (Hz), channels =
    * channels, durationMs = clip length. For video (MP4): presentation dims
    * from the track headers, channels = track count, durationMs from the
    * movie header — the same typed envelope, field mapping documented per
    * modality.
    */
  final case class DecodedMedia(
      id: Long, mediaType: String, nBytes: Int,
      width: Int, height: Int, channels: Int, durationMs: Long)

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
        img.getWidth, img.getHeight, img.getRaster.getNumBands, durationMs = 0L)
    case "audio/wav" =>
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(m.media))
      try {
        val frames = in.getFrameLength
        val rate = in.getFormat.getSampleRate
        DecodedMedia(m.id, m.mediaType, m.media.length,
          width = frames.toInt,
          height = rate.toInt,
          channels = in.getFormat.getChannels,
          durationMs = if (rate > 0) (frames * 1000L / rate.toLong) else 0L)
      } finally in.close()
    case "video/mp4" =>
      // REAL container parse (no frame decode needed for metadata): walk
      // the ISO-BMFF box tree, read mvhd timescale/duration and tkhd
      // presentation dims — plain big-endian header reads, pure JVM.
      val (w, h, durMs, nTracks) = parseMp4(m.media)
      require(nTracks > 0, s"no trak boxes in video/mp4 payload for id ${m.id}")
      DecodedMedia(m.id, m.mediaType, m.media.length,
        width = w, height = h, channels = nTracks, durationMs = durMs)
    case _ =>
      // STUB for formats without a JVM-native decoder (compressed audio,
      // non-MP4 video): deterministic pseudo-metadata from the byte stream
      val n = m.media.length
      val first = if (n > 0) java.lang.Byte.toUnsignedInt(m.media(0)) else 0
      DecodedMedia(m.id, m.mediaType, n,
        width = 64 + n % 512,
        height = 64 + (n * 7) % 512,
        channels = 1 + first % 3,
        durationMs = 0L)
  }

  /** Minimal ISO-BMFF (MP4) metadata parse — ISO/IEC 14496-12 box walk:
    * every box is [u32 size][4-char type][payload] (size 1 → u64 largesize
    * follows; size 0 → to end of enclosing box); `moov`/`trak` are pure
    * containers. Reads `mvhd` (v0/v1) timescale + duration and every
    * `tkhd` (v0/v1) 16.16-fixed presentation width/height. Returns
    * (maxWidth, maxHeight, durationMs, nTracks) — audio tracks carry 0×0
    * dims, so max-over-tracks is the video presentation size.
    */
  private[multimodal] def parseMp4(bytes: Array[Byte]): (Int, Int, Long, Int) = {
    val bb = java.nio.ByteBuffer.wrap(bytes) // big-endian by default
    var durationMs = 0L
    var nTracks = 0
    var w = 0
    var h = 0
    def walk(start: Long, end: Long): Unit = {
      var off = start
      while (off + 8 <= end) {
        val size32 = bb.getInt(off.toInt) & 0xffffffffL
        val btype = new String(bytes, off.toInt + 4, 4,
          java.nio.charset.StandardCharsets.US_ASCII)
        var hdr = 8L
        val size =
          if (size32 == 1L) { hdr = 16L; bb.getLong(off.toInt + 8) }
          else if (size32 == 0L) end - off
          else size32
        require(size >= hdr && off + size <= end,
          s"corrupt ISO-BMFF box '$btype' at offset $off (size $size)")
        btype match {
          case "moov" | "trak" => walk(off + hdr, off + size)
          case "mvhd" =>
            val p = (off + hdr).toInt
            require(size > hdr, s"corrupt mvhd at offset $off: empty payload")
            val ver = bytes(p) & 0xff
            // payload must cover the fixed-offset reads below, else a
            // truncated box would silently read into the NEXT box's bytes
            val need = if (ver == 1) 32L else 20L
            require(size - hdr >= need,
              s"corrupt mvhd v$ver at offset $off: payload ${size - hdr} < $need")
            val (ts, dur) =
              if (ver == 1) (bb.getInt(p + 20) & 0xffffffffL, bb.getLong(p + 24))
              else (bb.getInt(p + 12) & 0xffffffffL, bb.getInt(p + 16) & 0xffffffffL)
            if (ts > 0) durationMs = dur * 1000L / ts
          case "tkhd" =>
            nTracks += 1
            val p = (off + hdr).toInt
            require(size > hdr, s"corrupt tkhd at offset $off: empty payload")
            val ver = bytes(p) & 0xff
            val need = if (ver == 1) 96L else 84L
            require(size - hdr >= need,
              s"corrupt tkhd v$ver at offset $off: payload ${size - hdr} < $need")
            val wOff = if (ver == 1) p + 88 else p + 76
            val tw = bb.getInt(wOff) >>> 16 // 16.16 fixed point
            val th = bb.getInt(wOff + 4) >>> 16
            if (tw > w) w = tw
            if (th > h) h = th
          case _ => ()
        }
        off += size
      }
    }
    walk(0L, bytes.length.toLong)
    (w, h, durationMs, nTracks)
  }

  /** Deterministic synthetic MP4: a structurally-valid ISO-BMFF file
    * (ftyp + moov[mvhd + nTracks×trak[tkhd]], version-0 headers, timescale
    * 1000) with the given presentation dims and duration — the gate/spec
    * fixture exercising the REAL box parser, the video analog of
    * [[syntheticPng]].
    */
  def syntheticMp4(width: Int, height: Int, durationMs: Long, nTracks: Int): Array[Byte] = {
    val unityMatrix = Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    def box(tp: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length)
      b.put(tp.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      b.put(payload)
      b.array()
    }
    val ftyp = box("ftyp", {
      val b = java.nio.ByteBuffer.allocate(16)
      b.put("isom".getBytes); b.putInt(512); b.put("isom".getBytes); b.put("mp41".getBytes)
      b.array()
    })
    val mvhd = box("mvhd", {
      val b = java.nio.ByteBuffer.allocate(100)
      b.putInt(0)                  // version 0 + flags
      b.putInt(0); b.putInt(0)     // creation, modification
      b.putInt(1000)               // timescale: ms
      b.putInt(durationMs.toInt)   // duration
      b.putInt(0x10000)            // rate 1.0
      b.putShort(0x100.toShort)    // volume 1.0
      b.putShort(0); b.putLong(0)  // reserved
      unityMatrix.foreach(b.putInt)
      (0 until 6).foreach(_ => b.putInt(0)) // pre_defined
      b.putInt(nTracks + 1)        // next_track_ID
      b.array()
    })
    val traks = (1 to nTracks).map { tid =>
      box("trak", box("tkhd", {
        val b = java.nio.ByteBuffer.allocate(84)
        b.putInt(0)                // version 0 + flags
        b.putInt(0); b.putInt(0)   // creation, modification
        b.putInt(tid)              // track_ID
        b.putInt(0)                // reserved
        b.putInt(durationMs.toInt) // duration
        b.putLong(0)               // reserved
        b.putShort(0); b.putShort(0); b.putShort(0); b.putShort(0)
        unityMatrix.foreach(b.putInt)
        b.putInt(width << 16); b.putInt(height << 16) // 16.16 fixed
        b.array()
      }))
    }
    ftyp ++ box("moov", (mvhd +: traks).reduce(_ ++ _))
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
