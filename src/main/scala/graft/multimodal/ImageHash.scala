package graft.multimodal

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Perceptual-hash image deduplication — beyond-reference (builder prompt:
  * multimodal + dedup). The classic dHash (difference hash): decode → area-
  * average the luminance onto a 9×8 grid → 64 bits, one per horizontal
  * neighbor comparison. Two properties make it the right primitive for
  * corpus-scale image dedup:
  *
  *   - the hash is INVARIANT to global brightness/contrast offsets (a
  *     constant added to every pixel shifts every pooled cell equally and
  *     leaves every `left < right` comparison unchanged), so re-encoded /
  *     levels-adjusted copies of an image collide into the same 64-bit key;
  *   - candidate generation is then a plain equi-join on the hash — the same
  *     banded-index discipline as the text SimHash family
  *     (`graft.dedup.Dedup`): no all-pairs stage anywhere, and at 100 TB the
  *     hash column is a bucketed join key like any other.
  *
  * Hash equality is a CANDIDATE signal, not a verdict: distinct images can
  * collide in 64 bits, so [[nearDupPairs]] exact-verifies every candidate
  * with a mean-centered L1 distance over the pooled grid (centering removes
  * the same brightness offset the hash is blind to). Detection and
  * verification read only the 72-double pooled vector carried with the
  * signature — the decoded raster never crosses a shuffle.
  */
object ImageHash {

  /** Pooled-grid geometry: dHash compares 9 columns pairwise per row. */
  val COLS = 9
  val ROWS = 8

  /** Per-image signature: the 64-bit dHash plus the pooled luminance grid
    * the exact-verify stage re-reads (ROWS*COLS = 72 doubles).
    */
  final case class ImageSignature(id: Long, dhash: Long, pooled: Array[Double])

  /** Area-averaged luminance on the ROWS×COLS grid, row-major. Integer
    * pixel/band sums accumulate in Long and divide once per cell, so the
    * pooled values are exact rationals rendered to double — deterministic
    * across partitionings and JVMs.
    */
  private[multimodal] def pooledLuminance(img: java.awt.image.BufferedImage): Array[Double] = {
    val raster = img.getRaster
    val (w, h, nb) = (img.getWidth, img.getHeight, raster.getNumBands)
    require(w >= COLS && h >= ROWS, s"image ${w}x$h smaller than the ${COLS}x$ROWS pooling grid")
    val out = new Array[Double](ROWS * COLS)
    var r = 0
    while (r < ROWS) {
      val y0 = r * h / ROWS; val y1 = (r + 1) * h / ROWS
      var c = 0
      while (c < COLS) {
        val x0 = c * w / COLS; val x1 = (c + 1) * w / COLS
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            var b = 0
            while (b < nb) { sum += raster.getSample(x, y, b); b += 1 }
            x += 1
          }
          y += 1
        }
        out(r * COLS + c) = sum.toDouble / ((y1 - y0).toLong * (x1 - x0) * nb)
        c += 1
      }
      r += 1
    }
    out
  }

  /** dHash bit (r, c) = 1 iff pooled(r)(c) < pooled(r)(c+1): 8 comparisons
    * per row × 8 rows = 64 bits.
    */
  private[multimodal] def dHash64(pooled: Array[Double]): Long = {
    var bits = 0L
    var r = 0
    while (r < ROWS) {
      var c = 0
      while (c < COLS - 1) {
        if (pooled(r * COLS + c) < pooled(r * COLS + c + 1))
          bits |= 1L << (r * (COLS - 1) + c)
        c += 1
      }
      r += 1
    }
    bits
  }

  /** Decode each payload with the REAL codec ([[javax.imageio]]) and emit
    * its signature. `mapPartitions` so heavyweight codec setup amortizes
    * per partition, matching [[Multimodal.decode]].
    */
  def signatures(media: Dataset[Multimodal.MediaRecord]): Dataset[ImageSignature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(m.media))
        require(img != null, s"undecodable ${m.mediaType} payload for id ${m.id}")
        val pooled = pooledLuminance(img)
        ImageSignature(m.id, dHash64(pooled), pooled)
      }
    }
  }

  /** Near-duplicate image pairs: equi-self-join on the 64-bit dHash (the
    * banded candidate stage — a shuffle hash join on a scalar key), then
    * exact verify: mean |centered(a) − centered(b)| over the pooled grid
    * ≤ `tol`. Brightness-shifted copies verify at ~0; accidental 64-bit
    * collisions between unrelated images are rejected here.
    */
  def nearDupPairs(sig: DataFrame, tol: Double): DataFrame = {
    // centered L1 = mean_i |(a_i − b_i) − mean(a − b)|: one diff array, its
    // mean computed once per pair (scalar column), then a single transform
    val n = lit((ROWS * COLS).toDouble)
    val a = sig.select(col("id").as("id_a"), col("dhash"), col("pooled").as("pa"))
    val b = sig.select(col("id").as("id_b"), col("dhash"), col("pooled").as("pb"))
    a.join(b, Seq("dhash"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("d", zip_with(col("pa"), col("pb"), (x, y) => x - y))
      .withColumn("dbar", aggregate(col("d"), lit(0.0d), _ + _) / n)
      .withColumn("pooled_l1",
        aggregate(transform(col("d"), x => abs(x - col("dbar"))), lit(0.0d), _ + _) / n)
      .filter(col("pooled_l1") <= tol)
      .select(col("id_a"), col("id_b"), round(col("pooled_l1"), 6).as("pooled_l1"))
  }

  /** Deterministic pattern PNG for the near-dup fixtures: grayscale,
    * px(x, y) = 16 + ((xs·x + ys·y + 29·patternId) mod 180) + shift with
    * pattern-dependent slopes xs = 3 + patternId mod 11, ys = 2 +
    * patternId mod 7. Max sample 16 + 179 + shift ≤ 255 for shift ≤ 60 —
    * no clamping, so a shifted copy is EXACTLY the base image plus a
    * constant and [[dHash64]] is provably identical on the pair.
    */
  def syntheticPatternPng(patternId: Long, width: Int, height: Int, shift: Int): Array[Byte] = {
    require(shift >= 0 && shift <= 60, s"shift $shift would clamp at 255")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    val xs = 3 + (patternId % 11).toInt
    val ys = 2 + (patternId % 7).toInt
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        raster.setSample(x, y, 0,
          16 + ((xs * x + ys * y + 29 * patternId) % 180).toInt + shift)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }
}
