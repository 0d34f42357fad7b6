package graft.multimodal

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {
  private lazy val sp = spark
  import sp.implicits._

  test("PNG roundtrip: real ImageIO decode reads back exact dims, bands, samples") {
    val bytes = Multimodal.syntheticPng(id = 7L, width = 20, height = 30, gray = false)
    // it is a real PNG payload
    assert(bytes.take(4).map(_ & 0xff).sameElements(Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt)))
    val d = Multimodal.decodeOne(Multimodal.MediaRecord(7L, bytes, "image/png"))
    assert((d.width, d.height, d.channels) == (20, 30, 3))
    // lossless: decoded raster holds the synthetic formula exactly
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    for (x <- Seq(0, 7, 19); y <- Seq(0, 11, 29); b <- 0 until 3)
      assert(img.getRaster.getSample(x, y, b) == ((31 * x + 7 * y + 13 * 7 + 11 * b) % 256).toInt)
    val gray = Multimodal.decodeOne(Multimodal.MediaRecord(8L,
      Multimodal.syntheticPng(8L, 16, 16, gray = true), "image/png"))
    assert(gray.channels == 1)
  }

  test("image features are exact stripe means of the decoded raster") {
    val id = 3L
    val (w, h) = (20, 18)
    val rec = Multimodal.MediaRecord(id, Multimodal.syntheticPng(id, w, h, gray = true), "image/png")
    val feats = Multimodal.extractFeatures(Seq(rec).toDS()).collect().head.features
    // hand-computed: feature k = mean over rows y=k (h<32 -> one row per
    // stripe k<h, empty stripes 0) of (31x+7y+13id) % 256 / 255
    for (k <- 0 until Multimodal.FEATURE_DIM) {
      val rows = (0 until h).filter(_ % Multimodal.FEATURE_DIM == k)
      val expected =
        if (rows.isEmpty) 0.0
        else {
          val s = (for (y <- rows; x <- 0 until w) yield (31 * x + 7 * y + 13 * id) % 256).sum
          s.toDouble / (255.0 * rows.size * w)
        }
      assert(feats(k) == expected, s"stripe $k")
    }
  }

  test("WAV decode: real javax.sound parse of frames, sample rate, channels") {
    // build a genuine 8kHz mono PCM WAV in memory
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val nFrames = 800
    val pcm = new Array[Byte](nFrames * fmt.getFrameSize)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    val d = Multimodal.decodeOne(Multimodal.MediaRecord(1L, out.toByteArray, "audio/wav"))
    assert(d.width == nFrames)   // frames
    assert(d.height == 8000)     // sample rate
    assert(d.channels == 1)
  }

  test("unsupported media types fall back to the disclosed deterministic stub") {
    val payload = Array.tabulate[Byte](100)(i => i.toByte)
    val d = Multimodal.decodeOne(Multimodal.MediaRecord(9L, payload, "video/x-matroska"))
    assert(d.width == 64 + 100 % 512 && d.channels == 1 + 0 % 3)
    assert(d.durationMs == 0L)
  }

  test("FLAC roundtrip: real STREAMINFO bit-unpack of rate, channels, total samples") {
    val bytes = Multimodal.syntheticFlac(sampleRate = 44100, channels = 2, totalSamples = 441_000L)
    assert(new String(bytes, 0, 4, java.nio.charset.StandardCharsets.US_ASCII) == "fLaC")
    val d = Multimodal.decodeOne(Multimodal.MediaRecord(3L, bytes, "audio/flac"))
    assert((d.width, d.height, d.channels, d.durationMs) == (441000, 44100, 2, 10000L))
    // 36-bit total-samples field: a >2^32 count survives the bit packing
    val big = Multimodal.parseFlac(Multimodal.syntheticFlac(96000, 8, (1L << 33) + 7))
    assert(big == ((96000, 8, (1L << 33) + 7)))
  }

  test("FLAC parse skips trailing metadata blocks and rejects corrupt streams") {
    val base = Multimodal.syntheticFlac(22050, 1, 1000L)
    // splice in a PADDING block (type 1) after STREAMINFO: unset the last
    // flag on STREAMINFO, append [last|type=1][len 4][4 zero bytes]
    val spliced = base.clone()
    spliced(4) = 0x00 // STREAMINFO no longer last
    val padded = spliced ++ Array[Byte](0x81.toByte, 0, 0, 4, 0, 0, 0, 0)
    assert(Multimodal.parseFlac(padded) == ((22050, 1, 1000L)))
    intercept[IllegalArgumentException] { // missing magic
      Multimodal.parseFlac("not a flac".getBytes)
    }
    intercept[IllegalArgumentException] { // truncated STREAMINFO
      Multimodal.parseFlac(base.take(20))
    }
    intercept[IllegalArgumentException] { // first block not STREAMINFO
      Multimodal.parseFlac(Array[Byte]('f', 'L', 'a', 'C', 0x81.toByte, 0, 0, 0))
    }
  }

  test("MP3 roundtrip: frame walk sums samples across frames, with and without ID3v2") {
    for (withId3 <- Seq(false, true); (rateIdx, rate) <- Seq((0, 44100), (1, 48000), (2, 32000))) {
      val bytes = Multimodal.syntheticMp3(rateIdx, mono = true, nFrames = 5, withId3 = withId3)
      val (r, ch, samples) = Multimodal.parseMp3(bytes)
      assert((r, ch, samples) == ((rate, 1, 5L * 1152)), s"rateIdx=$rateIdx id3=$withId3")
    }
    val stereo = Multimodal.decodeOne(Multimodal.MediaRecord(7L,
      Multimodal.syntheticMp3(0, mono = false, nFrames = 3, withId3 = false), "audio/mpeg"))
    assert((stereo.width, stereo.height, stereo.channels) == ((3 * 1152, 44100, 2)))
    assert(stereo.durationMs == 3L * 1152 * 1000 / 44100)
  }

  test("MP3 parse tolerates an ID3v1 trailer and rejects corrupt frames") {
    val frames = Multimodal.syntheticMp3(1, mono = true, nFrames = 2, withId3 = false)
    val tagged = frames ++ ("TAG" + "x" * 125).getBytes
    assert(Multimodal.parseMp3(tagged) == ((48000, 1, 2L * 1152)))
    intercept[IllegalArgumentException] { // garbage where a sync word must be
      Multimodal.parseMp3(frames ++ Array[Byte](0x12, 0x34, 0x56, 0x78))
    }
    intercept[IllegalArgumentException] { // truncated final frame
      Multimodal.parseMp3(frames.dropRight(10))
    }
    intercept[IllegalArgumentException] { // ID3 tag only, no frames
      Multimodal.parseMp3(Multimodal.syntheticMp3(0, mono = true, nFrames = 1,
        withId3 = true).take(42))
    }
  }

  test("MP4 roundtrip: real ISO-BMFF box walk reads back dims, duration, track count") {
    val bytes = Multimodal.syntheticMp4(width = 640, height = 360, durationMs = 12345L, nTracks = 2)
    // it is a real ISO-BMFF payload: box 1 is ftyp with brand isom
    assert(new String(bytes, 4, 4, java.nio.charset.StandardCharsets.US_ASCII) == "ftyp")
    assert(new String(bytes, 8, 4, java.nio.charset.StandardCharsets.US_ASCII) == "isom")
    val d = Multimodal.decodeOne(Multimodal.MediaRecord(5L, bytes, "video/mp4"))
    assert((d.width, d.height, d.channels, d.durationMs) == (640, 360, 2, 12345L))
    assert(d.nBytes == bytes.length)
  }

  test("MP4 parse handles version-1 headers and 64-bit box sizes") {
    // hand-build moov[mvhd v1 + trak[tkhd v1]] with a largesize moov box
    def u32(b: java.nio.ByteBuffer, v: Long): Unit = b.putInt(v.toInt)
    val mvhd = java.nio.ByteBuffer.allocate(8 + 112)
    u32(mvhd, 8 + 112); mvhd.put("mvhd".getBytes)
    mvhd.putInt(0x01000000)            // version 1
    mvhd.putLong(0L); mvhd.putLong(0L) // creation, modification (64-bit)
    mvhd.putInt(90000)                 // timescale
    mvhd.putLong(180000L)              // duration (64-bit) -> 2000 ms
    mvhd.position(mvhd.capacity)
    val tkhd = java.nio.ByteBuffer.allocate(8 + 96)
    u32(tkhd, 8 + 96); tkhd.put("tkhd".getBytes)
    tkhd.putInt(0x01000000)            // version 1
    tkhd.putLong(0L); tkhd.putLong(0L) // creation, modification
    tkhd.putInt(1); tkhd.putInt(0)     // track_ID, reserved
    tkhd.putLong(180000L)              // duration (64-bit)
    tkhd.putLong(0L)                   // reserved
    tkhd.putShort(0); tkhd.putShort(0); tkhd.putShort(0); tkhd.putShort(0)
    Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(tkhd.putInt)
    tkhd.putInt(1280 << 16); tkhd.putInt(720 << 16)
    val trak = java.nio.ByteBuffer.allocate(8 + tkhd.capacity)
    u32(trak, 8 + tkhd.capacity); trak.put("trak".getBytes); trak.put(tkhd.array())
    // moov with size==1 + 64-bit largesize
    val inner = mvhd.array() ++ trak.array()
    val moov = java.nio.ByteBuffer.allocate(16 + inner.length)
    u32(moov, 1L); moov.put("moov".getBytes)
    moov.putLong(16L + inner.length); moov.put(inner)
    val (w, h, dur, n) = Multimodal.parseMp4(moov.array())
    assert((w, h, dur, n) == (1280, 720, 2000L, 1))
  }

  test("property: every synthetic MP4 parses back to its construction parameters (200 random draws)") {
    val rng = new scala.util.Random(7)
    for (_ <- 0 until 200) {
      val (w, h) = (rng.nextInt(4096) + 1, rng.nextInt(4096) + 1)
      val dur = rng.nextLong(86400000L)
      val tracks = rng.nextInt(8) + 1
      val parsed = Multimodal.parseMp4(Multimodal.syntheticMp4(w, h, dur, tracks))
      assert(parsed == ((w, h, dur, tracks)))
    }
  }

  test("corrupt MP4 boxes fail loudly, not silently") {
    val bytes = Multimodal.syntheticMp4(64, 64, 100L, 1)
    val truncated = bytes.take(bytes.length - 10)
    intercept[IllegalArgumentException] {
      Multimodal.parseMp4(truncated)
    }
  }

  test("truncated mvhd/tkhd payloads raise instead of reading the next box's bytes") {
    // hand-built moov[mvhd] whose mvhd declares a 10-byte payload — too
    // short for even the v0 fixed-offset reads (needs 20)
    def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length)
      bb.put(tpe.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      bb.put(payload)
      bb.array()
    }
    val shortMvhd = box("moov", box("mvhd", new Array[Byte](10)))
    val e1 = intercept[IllegalArgumentException] { Multimodal.parseMp4(shortMvhd) }
    assert(e1.getMessage.contains("mvhd"))
    val shortTkhd = box("moov", box("trak", box("tkhd", new Array[Byte](40))))
    val e2 = intercept[IllegalArgumentException] { Multimodal.parseMp4(shortTkhd) }
    assert(e2.getMessage.contains("tkhd"))
  }

  test("WebM roundtrip: real EBML walk reads back dims, duration, track count") {
    val bytes = Multimodal.syntheticWebm(width = 640, height = 360,
      durationMs = 12345L, nTracks = 2)
    assert(Multimodal.parseWebm(bytes) == ((640, 360, 12345L, 2)))
    val dec = Multimodal.decodeOne(
      Multimodal.MediaRecord(7L, bytes, "video/webm"))
    assert(dec.width == 640 && dec.height == 360 &&
      dec.channels == 2 && dec.durationMs == 12345L)
  }

  test("WebM parse handles float32 Duration and unknown-size Segment") {
    def el(id: Array[Byte], payload: Array[Byte]): Array[Byte] =
      id ++ Array((0x80 | payload.length).toByte) ++ payload
    def id(bs: Int*): Array[Byte] = bs.map(_.toByte).toArray
    val header = el(id(0x1a, 0x45, 0xdf, 0xa3), Array.emptyByteArray)
    val durF32 = java.nio.ByteBuffer.allocate(4).putFloat(2500f).array()
    val info = el(id(0x15, 0x49, 0xa9, 0x66),
      el(id(0x2a, 0xd7, 0xb1), Array(0x0f.toByte, 0x42.toByte, 0x40.toByte)) ++ // 10^6
        el(id(0x44, 0x89), durF32))
    val video = el(id(0xae), el(id(0xe0),
      el(id(0xb0), Array(0x50.toByte)) ++ el(id(0xba), Array(0x40.toByte))))
    val tracks = el(id(0x16, 0x54, 0xae, 0x6b), video)
    // Segment with the unknown-size marker (0xFF): extends to end of stream
    val seg = id(0x18, 0x53, 0x80, 0x67) ++ Array(0xff.toByte) ++ info ++ tracks
    assert(Multimodal.parseWebm(header ++ seg) == ((0x50, 0x40, 2500L, 1)))
  }

  test("corrupt WebM fails loudly: bad magic and overrunning element size") {
    intercept[IllegalArgumentException] {
      Multimodal.parseWebm(Array[Byte](0x00, 0x01, 0x02, 0x03))
    }
    val good = Multimodal.syntheticWebm(320, 240, 1000L, 1)
    val truncated = good.take(good.length - 3)
    intercept[IllegalArgumentException] { Multimodal.parseWebm(truncated) }
  }

  test("property: every synthetic WebM parses back to its construction parameters (200 random draws)") {
    val rnd = new scala.util.Random(20260814L)
    (1 to 200).foreach { _ =>
      val w = 16 + rnd.nextInt(4000); val h = 16 + rnd.nextInt(3000)
      val d = rnd.nextLong(10000000L); val t = 1 + rnd.nextInt(3)
      assert(Multimodal.parseWebm(Multimodal.syntheticWebm(w, h, d, t)) == ((w, h, d, t)))
    }
  }

  test("decode is distributed: partition-batched over a Dataset") {
    val recs = (0L until 8L).map(i =>
      Multimodal.MediaRecord(i, Multimodal.syntheticPng(i, 16 + i.toInt, 16, gray = i % 2 == 0), "image/png"))
    val out = Multimodal.decode(recs.toDS().repartition(4)).collect()
    assert(out.length == 8)
    out.foreach(d => assert(d.width == 16 + d.id.toInt && d.channels == (if (d.id % 2 == 0) 1 else 3)))
  }

  test("EXIF roundtrip in both TIFF byte orders") {
    for (le <- Seq(true, false)) {
      val jpeg = Multimodal.syntheticJpegExif(6, "2024:03:15 10:20:30", "camX", le)
      val (o, dt, mk, bo) = Multimodal.parseExif(jpeg)
      assert(o == 6 && dt == "2024:03:15 10:20:30" && mk == "camX")
      assert(bo == (if (le) "II" else "MM"))
    }
  }

  test("EXIF short ASCII values go inline (TIFF 4-byte value field) and read back") {
    // "abc" + NUL = 4 bytes: must be inline, not offset
    val jpeg = Multimodal.syntheticJpegExif(1, "2024:01:01 00:00:00", "abc", littleEndian = true)
    val (_, _, mk, _) = Multimodal.parseExif(jpeg)
    assert(mk == "abc")
  }

  test("corrupt EXIF raises: bad SOI, absent APP1, bad byte order, truncation") {
    val good = Multimodal.syntheticJpegExif(3, "2024:01:01 00:00:00", "cam0", littleEndian = false)
    intercept[IllegalArgumentException] {
      Multimodal.parseExif(Array[Byte](0, 1, 2, 3))
    }
    intercept[IllegalArgumentException] { // SOI + EOI only: no APP1
      Multimodal.parseExif(Array(0xFF, 0xD8, 0xFF, 0xD9).map(_.toByte))
    }
    val badBo = good.clone()
    badBo(12) = 'X'.toByte // "II"/"MM" tag inside the TIFF header
    intercept[IllegalArgumentException] { Multimodal.parseExif(badBo) }
    intercept[IllegalArgumentException] {
      Multimodal.parseExif(good.take(good.length / 2))
    }
  }
}
