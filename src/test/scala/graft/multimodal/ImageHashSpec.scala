package graft.multimodal

import graft.SparkTestBase

class ImageHashSpec extends SparkTestBase {
  private lazy val sp = spark
  import sp.implicits._

  private def sigOf(bytes: Array[Byte]): ImageHash.ImageSignature = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val pooled = ImageHash.pooledLuminance(img)
    ImageHash.ImageSignature(0L, ImageHash.dHash64(pooled), pooled)
  }

  private def phashOf(bytes: Array[Byte]): (Long, Array[Double]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val pooled = ImageHash.pooledGrid(img, ImageHash.PH_N, ImageHash.PH_N)
    (ImageHash.phash63(pooled), ImageHash.zScores(pooled))
  }

  test("pHash is invariant to brightness shift AND exact contrast doubling") {
    for (p <- Seq(0L, 7L, 99L, 5432L)) {
      val (hBase, zBase) = phashOf(ImageHash.syntheticAffinePng(p, 48, 40, 0, 1))
      val (hShift, zShift) = phashOf(ImageHash.syntheticAffinePng(p, 48, 40, 40, 1))
      val (hScale, zScale) = phashOf(ImageHash.syntheticAffinePng(p, 48, 40, 0, 2))
      assert(hBase == hShift, s"pattern $p brightness")
      assert(hBase == hScale, s"pattern $p contrast")
      // contrast z-scores are EXACTLY equal (power-of-two scaling commutes
      // with IEEE rounding); brightness z-scores equal to fp noise
      assert(zBase.zip(zScale).forall { case (a, b) => a == b }, s"pattern $p z exact")
      val l1 = zBase.zip(zShift).map { case (a, b) => math.abs(a - b) }.sum / zBase.length
      assert(l1 < 1e-9, s"pattern $p z l1 $l1")
    }
  }

  test("pHash distinguishes distinct patterns") {
    val hashes = Seq(0L, 1L, 2L, 3L, 17L, 1000004L)
      .map(p => phashOf(ImageHash.syntheticAffinePng(p, 48, 40, 0, 1))._1)
    assert(hashes.distinct.size == hashes.size)
  }

  test("phashNearDupPairs finds exactly the planted twins on a mixed set") {
    // ids 0..11: base/twin pairs per the gate construction — k%3==0
    // brightness, k%3==1 contrast, k%3==2 unrelated
    val media = (0L until 12L).map { id =>
      val k = id / 2
      val role = k % 3
      val twin = id % 2 == 1
      val pid = if (!twin || role <= 1) k else k + 1000000L
      val (shift, scale) =
        if (twin && role == 0) (40, 1) else if (twin && role == 1) (0, 2) else (0, 1)
      Multimodal.MediaRecord(id,
        ImageHash.syntheticAffinePng(pid, 48 + (pid % 7).toInt, 40 + (pid % 5).toInt, shift, scale),
        "image/png")
    }
    val sig = ImageHash.phashSignatures(sp.createDataset(media)).toDF()
    val pairs = ImageHash.phashNearDupPairs(sig, tol = 1e-6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L), (2L, 3L), (6L, 7L), (8L, 9L)))
  }

  test("dHash is invariant to a global brightness shift (the planted-twin construction)") {
    for (p <- Seq(0L, 5L, 41L, 1234L)) {
      val base = sigOf(ImageHash.syntheticPatternPng(p, 40, 32, shift = 0))
      val shifted = sigOf(ImageHash.syntheticPatternPng(p, 40, 32, shift = 24))
      assert(base.dhash == shifted.dhash, s"pattern $p")
      // pooled cells shift by exactly the constant → centered L1 ~ 0
      val diffs = base.pooled.zip(shifted.pooled).map { case (a, b) => b - a }
      val dbar = diffs.sum / diffs.length
      val l1 = diffs.map(d => math.abs(d - dbar)).sum / diffs.length
      assert(l1 < 1e-9, s"pattern $p centered L1 $l1")
    }
  }

  test("dHash distinguishes distinct patterns (slope-varied fixtures)") {
    val hashes = (0L until 40L).map(p =>
      sigOf(ImageHash.syntheticPatternPng(p, 40, 32, shift = 0)).dhash)
    // distinct slopes/phases should not all collide; allow rare collisions
    assert(hashes.distinct.size >= 35, s"only ${hashes.distinct.size} distinct hashes in 40")
  }

  test("pooled luminance is the exact area average on the 9x8 grid") {
    // hand-built 18x16 gray image with known samples
    val img = new java.awt.image.BufferedImage(18, 16, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 16; x <- 0 until 18) img.getRaster.setSample(x, y, 0, x + 10 * y)
    val pooled = ImageHash.pooledLuminance(img)
    // cell (r=0, c=0): x in [0,2), y in [0,2) → samples {0,1,10,11} → mean 5.5
    assert(pooled(0) == 5.5)
    // cell (r=7, c=8): x in [16,18), y in [14,16) → {156,157,166,167} → 161.5
    assert(pooled(7 * 9 + 8) == 161.5)
  }

  test("nearDupPairs: equi-join on dHash + centered-L1 verify finds exactly the planted twins") {
    val recs = (0L until 24L).map { id =>
      val k = id / 2
      val paired = k % 3 == 0
      val patternId = if (id % 2 == 0 || paired) k else k + 1000000L
      val shift = if (id % 2 == 1 && paired) 24 else 0
      val w = 16 + (patternId * 13 % 48).toInt
      val h = 16 + (patternId * 7 % 48).toInt
      Multimodal.MediaRecord(id,
        ImageHash.syntheticPatternPng(patternId, w, h, shift), "image/png")
    }
    val sig = ImageHash.signatures(recs.toDS()).toDF()
    val pairs = ImageHash.nearDupPairs(sig, tol = 2.0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val expected = (0L until 24L by 2).filter(id => (id / 2) % 3 == 0).map(id => (id, id + 1)).toSet
    assert(pairs == expected)
  }

  test("verify stage rejects a forced 64-bit collision between unrelated images") {
    // two flat-gradient images with identical comparison signs but different
    // content: px = x (slope 1) vs px = 2x (slope 2) → same dHash (every
    // left<right), different centered pooled values → verify must reject
    def flat(slope: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(36, 16, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until 16; x <- 0 until 36) img.getRaster.setSample(x, y, 0, slope * x)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val a = sigOf(flat(1)); val b = sigOf(flat(2))
    assert(a.dhash == b.dhash, "construction should collide in 64 bits")
    val sig = Seq(
      ImageHash.ImageSignature(1L, a.dhash, a.pooled),
      ImageHash.ImageSignature(2L, b.dhash, b.pooled)).toDS().toDF()
    assert(ImageHash.nearDupPairs(sig, tol = 2.0).count() == 0)
  }
}
