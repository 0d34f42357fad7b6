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
  * not pseudo-metadata. Container METADATA is parsed natively for
  * `video/mp4` (ISO-BMFF box walk, round 4), `audio/flac` (STREAMINFO),
  * `audio/mpeg` (Layer III frame-header walk) and `video/webm`
  * (Matroska EBML walk) (round 5) — plain header reads, no payload
  * decode. Every shipped mediaType now has a REAL parser; the default
  * branch's deterministic stub is unreached by any of them and kept only
  * so third-party media types keep the pipeline total.
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
    case "audio/flac" =>
      // REAL container parse: FLAC STREAMINFO block (plain header read,
      // pure JVM) — same envelope mapping as audio/wav: width = total
      // samples, height = sample rate
      val (rate, channels, totalSamples) = parseFlac(m.media)
      DecodedMedia(m.id, m.mediaType, m.media.length,
        width = totalSamples.toInt,
        height = rate,
        channels = channels,
        durationMs = if (rate > 0) totalSamples * 1000L / rate else 0L)
    case "audio/mpeg" =>
      // REAL frame-header walk: MPEG audio Layer III sync-word scan over
      // every frame (ID3v2 prefix skipped, ID3v1 trailer tolerated) —
      // duration from summed samples-per-frame, no payload decode needed
      val (rate, channels, totalSamples) = parseMp3(m.media)
      DecodedMedia(m.id, m.mediaType, m.media.length,
        width = totalSamples.toInt,
        height = rate,
        channels = channels,
        durationMs = if (rate > 0) totalSamples * 1000L / rate else 0L)
    case "video/webm" =>
      // REAL container parse: Matroska/WebM EBML walk (round 5) — element
      // id/size varints, Segment→Info (TimecodeScale, Duration float) and
      // Segment→Tracks→TrackEntry→Video (PixelWidth/PixelHeight); plain
      // header reads, no frame decode
      val (w, h, durMs, nTracks) = parseWebm(m.media)
      require(nTracks > 0, s"no TrackEntry in video/webm payload for id ${m.id}")
      DecodedMedia(m.id, m.mediaType, m.media.length,
        width = w, height = h, channels = nTracks, durationMs = durMs)
    case _ =>
      // STUB: unreached by any shipped mediaType (every gate format has a
      // real parser above); kept so third-party media types keep the
      // pipeline total — deterministic pseudo-metadata from the byte stream
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

  /** FLAC STREAMINFO parse (the mandatory first metadata block of every
    * FLAC stream): "fLaC" magic, then [1B last-flag+type][u24 length]
    * blocks; STREAMINFO (type 0, 34 bytes) carries a bit-packed
    * 20-bit sample rate / 3-bit channels-1 / 5-bit bps-1 / 36-bit total
    * samples. Plain big-endian header reads, pure JVM, no frame decode.
    * Returns (sampleRate, channels, totalSamples).
    */
  private[multimodal] def parseFlac(bytes: Array[Byte]): (Int, Int, Long) = {
    def u(i: Int): Int = java.lang.Byte.toUnsignedInt(bytes(i))
    require(bytes.length >= 8 &&
      bytes(0) == 'f' && bytes(1) == 'L' && bytes(2) == 'a' && bytes(3) == 'C',
      "not a FLAC stream: missing fLaC magic")
    var off = 4
    var first = true
    var result: Option[(Int, Int, Long)] = None
    var last = false
    while (!last) {
      require(off + 4 <= bytes.length, s"corrupt FLAC metadata header at offset $off")
      val b0 = u(off)
      last = (b0 & 0x80) != 0
      val btype = b0 & 0x7f
      val blen = (u(off + 1) << 16) | (u(off + 2) << 8) | u(off + 3)
      require(off + 4 + blen <= bytes.length,
        s"corrupt FLAC metadata block type $btype at offset $off (length $blen)")
      // spec: STREAMINFO MUST be the first metadata block
      require(!first || btype == 0, s"FLAC stream does not start with STREAMINFO (type $btype)")
      if (btype == 0) {
        require(blen >= 34, s"corrupt STREAMINFO: length $blen < 34")
        val p = off + 4
        val rate = (u(p + 10) << 12) | (u(p + 11) << 4) | (u(p + 12) >>> 4)
        val channels = ((u(p + 12) >>> 1) & 0x7) + 1
        val totalSamples = ((u(p + 13) & 0xf).toLong << 32) |
          ((u(p + 14).toLong << 24) | (u(p + 15) << 16) | (u(p + 16) << 8) | u(p + 17))
        require(rate > 0, "corrupt STREAMINFO: sample rate 0")
        result = Some((rate, channels, totalSamples))
      }
      first = false
      off += 4 + blen
    }
    result.getOrElse(sys.error("unreachable: STREAMINFO enforced first"))
  }

  private val Mp3BitrateKbpsV1L3 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Mp3BitrateKbpsV2L3 =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
  private val Mp3RatesV1 = Array(44100, 48000, 32000)

  /** MPEG audio (MP3, Layer III) frame-header walk: skip an ID3v2 prefix
    * (syncsafe size), then hop frame to frame on the computed frame length
    * (144·bitrate/rate + padding for MPEG1; half for MPEG2/2.5), summing
    * samples per frame (1152 MPEG1 / 576 MPEG2/2.5); an ID3v1 "TAG"
    * trailer is tolerated. Duration needs no payload decode — CBR and VBR
    * both walk exactly, frame by frame.
    * Returns (sampleRate, channels, totalSamples).
    */
  private[multimodal] def parseMp3(bytes: Array[Byte]): (Int, Int, Long) = {
    def u(i: Int): Int = java.lang.Byte.toUnsignedInt(bytes(i))
    var off = 0
    // ID3v2: "ID3" + ver(2) + flags(1) + 28-bit syncsafe size
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
      val sz = (u(6) << 21) | (u(7) << 14) | (u(8) << 7) | u(9)
      off = 10 + sz
      require(off <= bytes.length, s"corrupt ID3v2 tag: declared size $sz overruns payload")
    }
    var rate = 0
    var channels = 0
    var totalSamples = 0L
    var nFrames = 0
    var done = false
    while (!done && off + 4 <= bytes.length) {
      if (bytes(off) == 'T' && off + 3 <= bytes.length &&
        bytes(off + 1) == 'A' && bytes(off + 2) == 'G') {
        done = true // ID3v1 trailer: last 128 bytes, no more frames
      } else {
        require(u(off) == 0xff && (u(off + 1) & 0xe0) == 0xe0,
          s"corrupt MP3: no frame sync at offset $off after $nFrames frames")
        val verBits = (u(off + 1) >>> 3) & 0x3 // 3=MPEG1, 2=MPEG2, 0=MPEG2.5
        val layerBits = (u(off + 1) >>> 1) & 0x3 // 1 = Layer III
        require(verBits != 1, s"corrupt MP3: reserved MPEG version at offset $off")
        require(layerBits == 1, s"unsupported MPEG layer at offset $off (Layer III only)")
        val brIdx = (u(off + 2) >>> 4) & 0xf
        val srIdx = (u(off + 2) >>> 2) & 0x3
        require(brIdx >= 1 && brIdx <= 14, s"corrupt MP3: bitrate index $brIdx at offset $off")
        require(srIdx != 3, s"corrupt MP3: reserved sample-rate index at offset $off")
        val mpeg1 = verBits == 3
        val kbps = (if (mpeg1) Mp3BitrateKbpsV1L3 else Mp3BitrateKbpsV2L3)(brIdx)
        val baseRate = Mp3RatesV1(srIdx)
        val frameRate = if (mpeg1) baseRate else if (verBits == 2) baseRate / 2 else baseRate / 4
        val padding = (u(off + 2) >>> 1) & 0x1
        val frameLen = (if (mpeg1) 144000 else 72000) * kbps / frameRate + padding
        require(frameLen > 4 && off + frameLen <= bytes.length,
          s"corrupt MP3: frame at offset $off (length $frameLen) overruns payload")
        val chan = if (((u(off + 3) >>> 6) & 0x3) == 3) 1 else 2
        if (nFrames == 0) { rate = frameRate; channels = chan }
        else require(frameRate == rate, s"sample-rate change mid-stream at offset $off")
        totalSamples += (if (mpeg1) 1152 else 576)
        nFrames += 1
        off += frameLen
      }
    }
    require(nFrames > 0, "corrupt MP3: no audio frames found")
    (rate, channels, totalSamples)
  }

  /** Minimal Matroska/WebM metadata parse — an EBML walk (RFC 8794 varint
    * framing; Matroska element ids): every element is [id varint][size
    * varint][payload]; known containers (Segment 0x18538067, Info
    * 0x1549A966, Tracks 0x1654AE6B, TrackEntry 0xAE, Video 0xE0) are
    * descended, TimecodeScale 0x2AD7B1 (uint ns, default 10^6) and
    * Duration 0x4489 (float32/float64, timecode-scale units) give the
    * clip length, PixelWidth 0xB0 / PixelHeight 0xBA the presentation
    * dims (max over video tracks, like the MP4 tkhd walk). Unknown-size
    * elements (all value bits set) extend to the enclosing end, per spec.
    * Returns (maxWidth, maxHeight, durationMs, nTracks).
    */
  private[multimodal] def parseWebm(bytes: Array[Byte]): (Int, Int, Long, Int) = {
    def u(i: Int): Int = java.lang.Byte.toUnsignedInt(bytes(i))
    require(bytes.length >= 4 &&
      u(0) == 0x1a && u(1) == 0x45 && u(2) == 0xdf && u(3) == 0xa3,
      "not an EBML stream: missing 0x1A45DFA3 magic")
    // varint length from the leading byte: 1 + count of leading zero bits
    def vlen(b0: Int, max: Int, what: String, off: Int): Int = {
      val len = java.lang.Integer.numberOfLeadingZeros(b0) - 23
      require(b0 != 0 && len <= max, s"corrupt EBML $what varint at offset $off")
      len
    }
    var w = 0; var h = 0; var nTracks = 0
    var tcScale = 1000000L
    var durRaw = 0.0; var haveDur = false
    def walk(start: Int, end: Int): Unit = {
      var off = start
      while (off < end) {
        require(off < bytes.length, s"corrupt EBML: element past end at offset $off")
        val il = vlen(u(off), 4, "id", off)
        require(off + il <= end, s"corrupt EBML id at offset $off")
        var id = 0L
        (0 until il).foreach(k => id = (id << 8) | u(off + k))
        val so = off + il
        require(so < end, s"corrupt EBML: size missing at offset $so")
        val sl = vlen(u(so), 8, "size", so)
        require(so + sl <= end, s"corrupt EBML size at offset $so")
        var sv = (u(so) & (0xff >>> sl)).toLong
        (1 until sl).foreach(k => sv = (sv << 8) | u(so + k))
        val p = so + sl
        val sz = if (sv == (1L << (7 * sl)) - 1) (end - p).toLong else sv // unknown-size
        require(p + sz <= end,
          s"corrupt EBML element 0x${id.toHexString} at offset $off (size $sz)")
        def uintPayload(): Long = {
          require(sz >= 1 && sz <= 8, s"EBML uint 0x${id.toHexString} has length $sz")
          var v = 0L; (0 until sz.toInt).foreach(k => v = (v << 8) | u(p + k)); v
        }
        id match {
          case 0x18538067L | 0x1549A966L | 0x1654AE6BL | 0xe0L =>
            walk(p, (p + sz).toInt)
          case 0xaeL => nTracks += 1; walk(p, (p + sz).toInt)
          case 0x2ad7b1L => tcScale = uintPayload()
          case 0x4489L =>
            require(sz == 4 || sz == 8, s"corrupt WebM Duration at offset $off: length $sz")
            durRaw =
              if (sz == 4) java.lang.Float.intBitsToFloat(uintPayload().toInt).toDouble
              else java.lang.Double.longBitsToDouble(uintPayload())
            haveDur = true
          case 0xb0L => val v = uintPayload().toInt; if (v > w) w = v
          case 0xbaL => val v = uintPayload().toInt; if (v > h) h = v
          case _ => () // EBML header, TrackNumber, TrackType, Clusters, ...
        }
        off = (p + sz).toInt
      }
    }
    walk(0, bytes.length)
    val durMs = if (haveDur && tcScale > 0) math.round(durRaw * tcScale / 1e6) else 0L
    (w, h, durMs, nTracks)
  }

  /** Deterministic synthetic WebM: EBML header (DocType "webm") + Segment
    * with Info (TimecodeScale 10^6 ns, Duration as float64 = exact for any
    * ms count < 2^53) and `nTracks` video TrackEntry elements carrying the
    * given dims — the fixture exercising the REAL EBML parser.
    */
  def syntheticWebm(width: Int, height: Int, durationMs: Long, nTracks: Int): Array[Byte] = {
    def esize(n: Int): Array[Byte] =
      if (n < 127) Array((0x80 | n).toByte)
      else { // 2-byte size: up to 16382 — plenty for metadata-only fixtures
        require(n < (1 << 14) - 1, s"synthetic WebM element too large: $n")
        Array((0x40 | (n >> 8)).toByte, (n & 0xff).toByte)
      }
    def el(id: Array[Byte], payload: Array[Byte]): Array[Byte] =
      id ++ esize(payload.length) ++ payload
    def uintBytes(v: Long): Array[Byte] = {
      val n = math.max(1, (64 - java.lang.Long.numberOfLeadingZeros(v) + 7) / 8)
      Array.tabulate(n)(k => ((v >>> (8 * (n - 1 - k))) & 0xff).toByte)
    }
    def id(bs: Int*): Array[Byte] = bs.map(_.toByte).toArray
    val header = el(id(0x1a, 0x45, 0xdf, 0xa3),
      el(id(0x42, 0x86), uintBytes(1)) ++      // EBMLVersion
        el(id(0x42, 0x82), "webm".getBytes(java.nio.charset.StandardCharsets.US_ASCII)))
    val dur = java.nio.ByteBuffer.allocate(8)
      .putDouble(durationMs.toDouble).array()
    val info = el(id(0x15, 0x49, 0xa9, 0x66),
      el(id(0x2a, 0xd7, 0xb1), uintBytes(1000000L)) ++ el(id(0x44, 0x89), dur))
    val trackEntries = (1 to nTracks).map { tid =>
      el(id(0xae),
        el(id(0xd7), uintBytes(tid.toLong)) ++   // TrackNumber
          el(id(0x83), uintBytes(1L)) ++         // TrackType: video
          el(id(0xe0),
            el(id(0xb0), uintBytes(width.toLong)) ++
              el(id(0xba), uintBytes(height.toLong))))
    }
    val tracks = el(id(0x16, 0x54, 0xae, 0x6b), trackEntries.reduce(_ ++ _))
    header ++ el(id(0x18, 0x53, 0x80, 0x67), info ++ tracks)
  }

  /** Deterministic synthetic FLAC: "fLaC" magic + a single STREAMINFO
    * block (marked last) with the given stream parameters bit-packed
    * exactly per spec — the fixture exercising the REAL header parser.
    */
  def syntheticFlac(sampleRate: Int, channels: Int, totalSamples: Long): Array[Byte] = {
    require(sampleRate > 0 && sampleRate < (1 << 20), s"sample rate $sampleRate not 20-bit")
    require(channels >= 1 && channels <= 8, s"channels $channels out of FLAC range")
    require(totalSamples >= 0 && totalSamples < (1L << 36), "total samples not 36-bit")
    val si = new Array[Byte](34)
    val bps = 16
    si(0) = 0x10; si(1) = 0x00 // min block size 4096
    si(2) = 0x10; si(3) = 0x00 // max block size 4096
    // min/max frame size (bytes 4..9) left 0 = unknown
    si(10) = ((sampleRate >>> 12) & 0xff).toByte
    si(11) = ((sampleRate >>> 4) & 0xff).toByte
    si(12) = (((sampleRate & 0xf) << 4) | (((channels - 1) & 0x7) << 1) |
      (((bps - 1) >>> 4) & 0x1)).toByte
    si(13) = ((((bps - 1) & 0xf) << 4) | ((totalSamples >>> 32) & 0xf).toInt).toByte
    si(14) = ((totalSamples >>> 24) & 0xff).toByte
    si(15) = ((totalSamples >>> 16) & 0xff).toByte
    si(16) = ((totalSamples >>> 8) & 0xff).toByte
    si(17) = (totalSamples & 0xff).toByte
    // bytes 18..33: MD5 of the (absent) audio data — zeros = unknown
    Array[Byte]('f', 'L', 'a', 'C', 0x80.toByte, 0, 0, 34) ++ si
  }

  /** Deterministic synthetic MP3: `nFrames` CBR MPEG1 Layer III frames at
    * 128 kbps (deterministic filler bytes), optionally prefixed with an
    * ID3v2 tag — exercises the REAL frame walk including the tag skip.
    * `rateIdx`: 0=44100, 1=48000, 2=32000.
    */
  def syntheticMp3(rateIdx: Int, mono: Boolean, nFrames: Int, withId3: Boolean): Array[Byte] = {
    require(rateIdx >= 0 && rateIdx <= 2, s"rateIdx $rateIdx out of range")
    require(nFrames >= 1, "at least one frame")
    val rate = Mp3RatesV1(rateIdx)
    val frameLen = 144000 * 128 / rate // no padding
    val out = new java.io.ByteArrayOutputStream()
    if (withId3) {
      val tagPayload = 32
      out.write(Array[Byte]('I', 'D', '3', 3, 0, 0))
      out.write(Array[Byte](0, 0, (tagPayload >>> 7).toByte, (tagPayload & 0x7f).toByte))
      (0 until tagPayload).foreach(i => out.write(i * 13 % 256))
    }
    (0 until nFrames).foreach { f =>
      val frame = new Array[Byte](frameLen)
      frame(0) = 0xff.toByte
      frame(1) = 0xfb.toByte // MPEG1, Layer III, no CRC
      frame(2) = ((9 << 4) | (rateIdx << 2)).toByte // 128 kbps, no padding
      frame(3) = (if (mono) 0xc0 else 0x00).toByte
      var i = 4
      while (i < frameLen) { frame(i) = ((f * 31 + i * 7) % 256).toByte; i += 1 }
      out.write(frame)
    }
    out.toByteArray
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

  /** EXIF metadata from a JPEG's APP1 segment (real TIFF/IFD walk, the
    * same plain-header-read class as [[parseMp4]]/[[parseFlac]]):
    * (orientation, dateTime, make, byteOrder). Orientation drives the
    * rotate-before-embed step every image pipeline needs; DateTime/Make
    * feed capture-time dedup and per-device quality priors. Handles both
    * byte orders ("II" little / "MM" big), SHORT values inline in the
    * 4-byte value field, and ASCII values inline (count ≤ 4) or via
    * offset. Malformed input raises (the corrupt-box rule — the caller's
    * quarantine wraps parse failures, the parser never limps).
    */
  def parseExif(bytes: Array[Byte]): (Int, String, String, String) = {
    def u(i: Int): Int = java.lang.Byte.toUnsignedInt(bytes(i))
    require(bytes.length >= 4 && u(0) == 0xFF && u(1) == 0xD8, "not a JPEG: missing SOI")
    // walk segments to APP1/Exif
    var p = 2
    var tiff = -1
    while (tiff < 0) {
      require(p + 4 <= bytes.length, "no Exif APP1 segment before end of data")
      require(u(p) == 0xFF, s"bad JPEG marker at offset $p")
      val marker = u(p + 1)
      require(marker != 0xD9 && marker != 0xDA, "no Exif APP1 segment before SOS/EOI")
      val len = (u(p + 2) << 8) | u(p + 3)
      require(len >= 2 && p + 2 + len <= bytes.length, s"truncated segment at offset $p")
      if (marker == 0xE1 && len >= 8 &&
          new String(bytes, p + 4, 6, "ISO-8859-1") == "Exif  ")
        tiff = p + 10
      else p += 2 + len
    }
    val bo = new String(bytes, tiff, 2, "ISO-8859-1")
    require(bo == "II" || bo == "MM", s"bad TIFF byte order '$bo'")
    val le = bo == "II"
    def u16(i: Int): Int =
      if (le) u(i) | (u(i + 1) << 8) else (u(i) << 8) | u(i + 1)
    def u32(i: Int): Long =
      if (le) u(i).toLong | (u(i + 1).toLong << 8) | (u(i + 2).toLong << 16) | (u(i + 3).toLong << 24)
      else (u(i).toLong << 24) | (u(i + 1).toLong << 16) | (u(i + 2).toLong << 8) | u(i + 3).toLong
    require(u16(tiff + 2) == 42, "bad TIFF magic")
    val ifd = tiff + u32(tiff + 4).toInt
    require(ifd + 2 <= bytes.length, "IFD0 offset past end of data")
    val nEntries = u16(ifd)
    var orientation = -1
    var dateTime = ""
    var make = ""
    def ascii(countField: Int, valueField: Int): String = {
      val n = u32(countField).toInt
      require(n >= 1, "empty ASCII EXIF value")
      val start = if (n <= 4) valueField else tiff + u32(valueField).toInt
      require(start + n <= bytes.length, "ASCII EXIF value past end of data")
      new String(bytes, start, n - 1, "ISO-8859-1") // strip trailing NUL
    }
    var e = 0
    while (e < nEntries) {
      val off = ifd + 2 + 12 * e
      require(off + 12 <= bytes.length, "truncated IFD entry")
      u16(off) match {
        case 0x0112 => orientation = u16(off + 8) // SHORT, inline
        case 0x0132 => dateTime = ascii(off + 4, off + 8)
        case 0x010F => make = ascii(off + 4, off + 8)
        case _ => ()
      }
      e += 1
    }
    require(orientation >= 1 && orientation <= 8, s"missing/bad orientation $orientation")
    (orientation, dateTime, make, bo)
  }

  /** Minimal JPEG carrying exactly the EXIF fields [[parseExif]] reads —
    * SOI, APP1 (TIFF header + IFD0 with Make/Orientation/DateTime in
    * ascending-tag order), a token SOF0, EOI. `littleEndian` picks the
    * TIFF byte order so BOTH decode paths get exercised; ASCII values go
    * inline when they fit TIFF's 4-byte value field and via offset
    * otherwise, exactly per spec.
    */
  def syntheticJpegExif(orientation: Int, dateTime: String, make: String,
      littleEndian: Boolean): Array[Byte] = {
    require(orientation >= 1 && orientation <= 8, s"bad orientation $orientation")
    val out = new java.io.ByteArrayOutputStream()
    def b(v: Int): Unit = out.write(v & 0xFF)
    def w16be(v: Int): Unit = { b(v >> 8); b(v) }
    // TIFF-endian writers into a local buffer
    val t = new java.io.ByteArrayOutputStream()
    def tb(v: Int): Unit = t.write(v & 0xFF)
    def t16(v: Int): Unit =
      if (littleEndian) { tb(v); tb(v >> 8) } else { tb(v >> 8); tb(v) }
    def t32(v: Long): Unit =
      if (littleEndian) { tb(v.toInt); tb((v >> 8).toInt); tb((v >> 16).toInt); tb((v >> 24).toInt) }
      else { tb((v >> 24).toInt); tb((v >> 16).toInt); tb((v >> 8).toInt); tb(v.toInt) }
    t.write((if (littleEndian) "II" else "MM").getBytes("ISO-8859-1"))
    t16(42); t32(8L)
    val mkBytes = make.getBytes("ISO-8859-1") :+ 0.toByte
    val dtBytes = dateTime.getBytes("ISO-8859-1") :+ 0.toByte
    val dataStart = 8 + 2 + 3 * 12 + 4 // IFD0 end
    val mkOff = dataStart
    val dtOff = dataStart + (if (mkBytes.length <= 4) 0 else mkBytes.length)
    t16(3) // entry count; ascending tag order: Make < Orientation < DateTime
    t16(0x010F); t16(2); t32(mkBytes.length.toLong)
    if (mkBytes.length <= 4) { mkBytes.foreach(x => tb(x.toInt)); (mkBytes.length until 4).foreach(_ => tb(0)) }
    else t32(mkOff.toLong)
    t16(0x0112); t16(3); t32(1L); t16(orientation); t16(0)
    t16(0x0132); t16(2); t32(dtBytes.length.toLong); t32(dtOff.toLong)
    t32(0L) // next IFD
    if (mkBytes.length > 4) t.write(mkBytes)
    t.write(dtBytes)
    val tiff = t.toByteArray
    b(0xFF); b(0xD8) // SOI
    b(0xFF); b(0xE1); w16be(2 + 6 + tiff.length)
    out.write("Exif  ".getBytes("ISO-8859-1")); out.write(tiff)
    // token SOF0 (8x8, 1 component) so the container is a plausible JPEG
    b(0xFF); b(0xC0); w16be(11); b(8); w16be(8); w16be(8); b(1); b(1); b(0x11); b(0)
    b(0xFF); b(0xD9) // EOI
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
