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

  /** Area-averaged luminance on an arbitrary rows×cols grid, row-major.
    * Integer pixel/band sums accumulate in Long and divide once per cell,
    * so the pooled values are exact rationals rendered to double —
    * deterministic across partitionings and JVMs.
    */
  private[multimodal] def pooledGrid(img: java.awt.image.BufferedImage,
      rows: Int, cols: Int): Array[Double] = {
    val raster = img.getRaster
    val (w, h, nb) = (img.getWidth, img.getHeight, raster.getNumBands)
    require(w >= cols && h >= rows, s"image ${w}x$h smaller than the ${cols}x$rows pooling grid")
    val out = new Array[Double](rows * cols)
    var r = 0
    while (r < rows) {
      val y0 = r * h / rows; val y1 = (r + 1) * h / rows
      var c = 0
      while (c < cols) {
        val x0 = c * w / cols; val x1 = (c + 1) * w / cols
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
        out(r * cols + c) = sum.toDouble / ((y1 - y0).toLong * (x1 - x0) * nb)
        c += 1
      }
      r += 1
    }
    out
  }

  private[multimodal] def pooledLuminance(img: java.awt.image.BufferedImage): Array[Double] =
    pooledGrid(img, ROWS, COLS)

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

  // ---- pHash (DCT perceptual hash) — the frequency-domain head ---------

  /** pHash pooling grid (32×32) and DCT block (top-left 8×8). */
  val PH_N = 32
  val PH_B = 8

  /** DCT-II basis, [[StrictMath.cos]] so the table is bit-identical on
    * every JVM (Math.cos may use platform intrinsics; StrictMath is
    * specified to fdlibm exactly).
    */
  private lazy val phCos: Array[Array[Double]] = Array.tabulate(PH_B, PH_N)((u, x) =>
    StrictMath.cos((2 * x + 1) * u * StrictMath.PI / (2.0 * PH_N)))

  /** 63-bit pHash: separable un-normalized DCT-II of the 32×32 pooled
    * luminance, top-left 8×8 coefficient block, DC EXCLUDED (that is what
    * buys brightness invariance — a constant shift lands entirely in DC),
    * bit i = AC_i > median(AC). Exactly invariant under contrast scaling
    * by powers of two (every sum and product scales exactly; the median
    * is an ELEMENT of the scaled set, so every comparison is preserved)
    * and invariant under brightness shifts up to ~1e-13 coefficient noise
    * — far below the fixture margins.
    */
  private[multimodal] def phash63(pooled: Array[Double]): Long = {
    require(pooled.length == PH_N * PH_N, s"need ${PH_N}x$PH_N pooled grid")
    val g = Array.ofDim[Double](PH_B, PH_N) // G(u, y) = row-direction pass
    var u = 0
    while (u < PH_B) {
      var y = 0
      while (y < PH_N) {
        var s = 0.0
        var x = 0
        while (x < PH_N) { s += pooled(y * PH_N + x) * phCos(u)(x); x += 1 }
        g(u)(y) = s
        y += 1
      }
      u += 1
    }
    val f = new Array[Double](PH_B * PH_B)
    u = 0
    while (u < PH_B) {
      var v = 0
      while (v < PH_B) {
        var s = 0.0
        var y = 0
        while (y < PH_N) { s += g(u)(y) * phCos(v)(y); y += 1 }
        f(u * PH_B + v) = s
        v += 1
      }
      u += 1
    }
    val ac = java.util.Arrays.copyOfRange(f, 1, PH_B * PH_B) // 63 AC coeffs
    val sorted = ac.clone()
    java.util.Arrays.sort(sorted)
    val med = sorted(31) // exact middle element of 63
    var bits = 0L
    var i = 0
    while (i < 63) { if (ac(i) > med) bits |= 1L << i; i += 1 }
    bits
  }

  /** Z-score normalization of the pooled grid — the pHash verify vector:
    * EXACTLY invariant under power-of-two contrast scaling (scaling
    * commutes with IEEE rounding, /1024 and sqrt(4v)=2·sqrt(v) are exact)
    * and brightness-invariant to fp noise. Division by n=1024 (a power of
    * two) is exact for any double.
    */
  private[multimodal] def zScores(p: Array[Double]): Array[Double] = {
    val n = p.length
    var s = 0.0
    var i = 0
    while (i < n) { s += p(i); i += 1 }
    val mean = s / n
    var v = 0.0
    i = 0
    while (i < n) { val d = p(i) - mean; v += d * d; i += 1 }
    val std = math.sqrt(v / n)
    require(std > 0, "constant image has no pHash")
    val out = new Array[Double](n)
    i = 0
    while (i < n) { out(i) = (p(i) - mean) / std; i += 1 }
    out
  }

  /** Per-image pHash signature: the 63-bit hash plus the z-normalized
    * 32×32 grid the exact-verify stage reads (8 KB/row — the verify
    * payload, like the dHash pooled grid, never the decoded raster).
    */
  final case class PhashSignature(id: Long, phash: Long, z: Array[Double])

  def phashSignatures(media: Dataset[Multimodal.MediaRecord]): Dataset[PhashSignature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(m.media))
        require(img != null, s"undecodable ${m.mediaType} payload for id ${m.id}")
        val pooled = pooledGrid(img, PH_N, PH_N)
        PhashSignature(m.id, phash63(pooled), zScores(pooled))
      }
    }
  }

  /** pHash near-dup pairs: equi-join on the 63-bit hash (banded-candidate
    * discipline), exact verify = mean |z_a − z_b| ≤ tol. Brightness- and
    * contrast-modified copies verify at (numerically) zero; 63-bit
    * collisions between unrelated images are rejected here.
    */
  def phashNearDupPairs(sig: DataFrame, tol: Double): DataFrame = {
    val n = lit((PH_N * PH_N).toDouble)
    val a = sig.select(col("id").as("id_a"), col("phash"), col("z").as("za"))
    val b = sig.select(col("id").as("id_b"), col("phash"), col("z").as("zb"))
    a.join(b, Seq("phash"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("z_l1",
        aggregate(zip_with(col("za"), col("zb"), (x, y) => abs(x - y)), lit(0.0d), _ + _) / n)
      .filter(col("z_l1") <= tol)
      .select(col("id_a"), col("id_b"), round(col("z_l1"), 6).as("z_l1"))
  }

  /** Deterministic pattern PNG with a contrast control for the pHash
    * fixtures: grayscale,
    * px = (8 + (xs·x + ys·y + x²%13 + 3·y²%11 + 29·patternId) mod 100)
    * · scale + shift. The quadratic texture terms matter: a PURE linear
    * sawtooth has exactly-duplicated DCT coefficients, which park AC
    * values exactly on the median — a knife edge where the ~1e-13
    * brightness-shift coefficient noise can flip a hash bit (real images
    * never have bit-identical DCT coefficients; the degenerate synthetic
    * ones did). Max sample (8+99)·scale + shift must stay ≤ 255 —
    * enforced — so a scaled/shifted copy is EXACTLY the base image under
    * the affine map and the invariance arguments are exact.
    */
  def syntheticAffinePng(patternId: Long, width: Int, height: Int,
      shift: Int, scale: Int): Array[Byte] = {
    require(scale >= 1 && 107 * scale + shift <= 255,
      s"scale=$scale shift=$shift would clamp at 255")
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
          (8 + ((xs * x + ys * y + (x * x) % 13 + 3 * ((y * y) % 11) +
            29 * patternId) % 100).toInt) * scale + shift)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
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
