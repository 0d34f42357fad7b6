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
    val d = Multimodal.decodeOne(Multimodal.MediaRecord(9L, payload, "video/mp4"))
    assert(d.width == 64 + 100 % 512 && d.channels == 1 + 0 % 3)
  }

  test("decode is distributed: partition-batched over a Dataset") {
    val recs = (0L until 8L).map(i =>
      Multimodal.MediaRecord(i, Multimodal.syntheticPng(i, 16 + i.toInt, 16, gray = i % 2 == 0), "image/png"))
    val out = Multimodal.decode(recs.toDS().repartition(4)).collect()
    assert(out.length == 8)
    out.foreach(d => assert(d.width == 16 + d.id.toInt && d.channels == (if (d.id % 2 == 0) 1 else 3)))
  }
}
