package graft.similarity

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed PCA over the embedding column — the learned counterpart of
  * the SRP random projection: estimate the corpus covariance in ONE pass,
  * extract the top principal directions, and project every vector onto
  * them (Matryoshka-style dimensionality reduction ahead of ANN).
  *
  * Scale decomposition (the part that matters at 100 TB):
  *   - the ONLY corpus-sized work is the moment pass — a custom typed
  *     [[Aggregator]] accumulating (n, Σx, Σxxᵀ) as d + d² running sums
  *     per partition with map-side combine. No d²-row explode (a
  *     posexplode² formulation would amplify the corpus 4096× at d=64),
  *     no driver-side row loop; exactly d²+d+1 doubles cross the wire per
  *     partition.
  *   - everything downstream (power iteration, deflation) runs on the
  *     d×d covariance — a driver-bounded axis, same contract as k-means'
  *     k×dim centroids.
  *
  * Determinism: the covariance is quantized to 6 dp, and every power-
  * iteration step renormalizes and re-quantizes to 6 dp — the same
  * round-6 recipe that makes the k-means / PQ codebooks bit-replayable by
  * the DuckDB oracle (drift from summation order is ~1e-16, nine orders
  * below the quantum). Driver rounding uses BigDecimal HALF_UP — the
  * rounding Spark's `round` and DuckDB's `round` both implement.
  */
object Pca {

  final case class MomentBuf(n: Long, s: Array[Double], g: Array[Double])

  /** One-pass second-moment aggregator: n, s[i] = Σ x_i and the Gram sums
    * g[i·d+j] = Σ x_i·x_j. Buffers merge associatively, so partial
    * aggregation (map-side combine) applies — the shuffle carries one
    * (d²+d+1)-double buffer per map partition, never rows.
    */
  final class CovMoments(dim: Int) extends Aggregator[Seq[Double], MomentBuf, MomentBuf] {
    override def zero: MomentBuf =
      MomentBuf(0L, Array.ofDim[Double](dim), Array.ofDim[Double](dim * dim))
    override def reduce(b: MomentBuf, row: Seq[Double]): MomentBuf = {
      val a = row.toArray
      require(a.length == dim, s"vector of length ${a.length}, expected $dim")
      var i = 0
      while (i < dim) {
        b.s(i) += a(i)
        var j = 0
        while (j < dim) { b.g(i * dim + j) += a(i) * a(j); j += 1 }
        i += 1
      }
      MomentBuf(b.n + 1L, b.s, b.g)
    }
    override def merge(x: MomentBuf, y: MomentBuf): MomentBuf = {
      var i = 0
      while (i < dim) { x.s(i) += y.s(i); i += 1 }
      var k = 0
      while (k < dim * dim) { x.g(k) += y.g(k); k += 1 }
      MomentBuf(x.n + y.n, x.s, x.g)
    }
    override def finish(r: MomentBuf): MomentBuf = r
    override def bufferEncoder: Encoder[MomentBuf] = Encoders.product[MomentBuf]
    override def outputEncoder: Encoder[MomentBuf] = Encoders.product[MomentBuf]
  }

  /** Spark/DuckDB-compatible 6-dp rounding (HALF_UP on the exact binary
    * value — what both engines' `round` implement for doubles).
    */
  private[similarity] def r6(x: Double): Double =
    new java.math.BigDecimal(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Population covariance as a dense driver matrix, each entry quantized
    * to 6 dp: cov[i][j] = round6(g_ij/n − (s_i/n)·(s_j/n)). The operation
    * order is fixed and mirrored by the SQL oracle.
    */
  def covarianceMatrix(df: DataFrame, vecCol: String, dim: Int): Array[Array[Double]] = {
    val spark = df.sparkSession
    import spark.implicits._
    val m = df.select(Similarity.asDouble(col(vecCol)).as("dv"))
      .as[Seq[Double]]
      .select(new CovMoments(dim).toColumn) // typed select → Dataset[MomentBuf]
      .head()
    val n = m.n.toDouble
    Array.tabulate(dim, dim) { (i, j) =>
      r6(m.g(i * dim + j) / n - (m.s(i) / n) * (m.s(j) / n))
    }
  }

  /** The covariance as a (i, j, cov) frame — the gate surface for the
    * one-pass moment aggregate.
    */
  def covarianceFrame(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val c = covarianceMatrix(df, vecCol, dim)
    (for (i <- 0 until dim; j <- 0 until dim) yield (i, j, c(i)(j)))
      .toDF("i", "j", "cov")
  }

  /** Top-`nComps` principal directions by power iteration with Hotelling
    * deflation, every step 6-dp-quantized so the oracle replays it:
    * component c starts at e_c, iterates v ← round6(Cv / ‖Cv‖) `iters`
    * times, takes λ = round6(vᵀCv), then deflates C ← round6(C − λ vvᵀ)
    * elementwise. All on the d×d driver matrix; the corpus is not touched.
    * Returns (component, weights).
    */
  def powerComponents(
      cov: Array[Array[Double]],
      nComps: Int,
      iters: Int): Seq[Array[Double]] =
    powerComponentsWithValues(cov, nComps, iters).map(_._1)

  /** [[powerComponents]] plus each direction's (6-dp-quantized) eigenvalue
    * λ_c = vᵀCv — the variance along the component, which whitening needs.
    */
  def powerComponentsWithValues(
      cov: Array[Array[Double]],
      nComps: Int,
      iters: Int): Seq[(Array[Double], Double)] = {
    val dim = cov.length
    var c = cov.map(_.clone())
    (0 until nComps).map { comp =>
      var v = Array.tabulate(dim)(i => if (i == comp) 1.0 else 0.0)
      for (_ <- 0 until iters) {
        val u = Array.tabulate(dim) { i =>
          var acc = 0.0; var j = 0
          while (j < dim) { acc += c(i)(j) * v(j); j += 1 }
          acc
        }
        val nrm = math.sqrt(u.map(x => x * x).sum)
        v = u.map(x => r6(x / nrm))
      }
      var lam = 0.0
      for (i <- 0 until dim; j <- 0 until dim) lam += v(i) * c(i)(j) * v(j)
      val l = r6(lam)
      c = Array.tabulate(dim, dim)((i, j) => r6(c(i)(j) - l * v(i) * v(j)))
      (v, l)
    }
  }

  /** Whitened projections: p_c / √λ_c — unit variance along every kept
    * direction, the standard pre-ANN normalization (anisotropic embedding
    * clouds otherwise let one dominant axis swamp L2 candidate ranking).
    * Same row-local shape as [[project]]; λ comes from the quantized
    * recipe, so the oracle divides by the identical sqrt.
    */
  def whitenedProjections(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      nComps: Int,
      iters: Int): DataFrame = {
    val cv = powerComponentsWithValues(covarianceMatrix(df, vecCol, dim), nComps, iters)
    cv.foreach { case (_, l) => require(l > 0.0, s"non-positive eigenvalue $l — fewer real components than requested") }
    val base = project(df, idCol, vecCol, cv.map(_._1))
    val wcols = cv.zipWithIndex.map { case ((_, lam), ci) =>
      round(col(s"p$ci") / math.sqrt(lam), 6).as(s"w$ci")
    }
    base.select(col("id") +: wcols: _*)
  }

  /** Project every vector onto the learned components — row-local dot
    * products against literal weight arrays (broadcast in the plan text,
    * like the k-means centroid literals): zero shuffle, zero joins.
    * Output: (id, p0 … p{nComps−1}), each projection 6-dp-rounded.
    */
  def project(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      comps: Seq[Array[Double]]): DataFrame = {
    val base = df.select(col(idCol).as("id"), Similarity.asDouble(col(vecCol)).as("dv"))
    val projCols = comps.zipWithIndex.map { case (w, ci) =>
      round(Similarity.dot(col("dv"), array(w.map(lit).toSeq: _*)), 6).as(s"p$ci")
    }
    base.select(col("id") +: projCols: _*)
  }

  /** The composed operator: one-pass covariance → quantized power
    * iteration → row-local projection.
    */
  def pcaProjections(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      nComps: Int,
      iters: Int): DataFrame = {
    val cov = covarianceMatrix(df, vecCol, dim)
    project(df, idCol, vecCol, powerComponents(cov, nComps, iters))
  }

  /** PCA-ANN composition (the learned-reduction analog of the PQ ADC scan):
    * candidates come from L2 distance in the nComps-dim PROJECTED space —
    * per query the `refine` closest projected points (ties → lowest id on
    * the 6-dp-rounded distance) — and the exact top-k re-ranks only those
    * candidates by true full-dimensional cosine. refine = corpus size
    * degenerates to brute force exactly (spec-proven), the same contract
    * as `pqTopK`'s refine=∞.
    *
    * Scale: the projection is row-local; candidate scoring works on
    * nComps-dim arrays (32× smaller at d=64, nComps=2) and at 100 TB is
    * where the IVF/banded index would build — over the reduced space —
    * while the exact refine touches raw vectors for refine·|queries| rows
    * only. Both top-k stages run the salted two-stage rank.
    */
  def pcaTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      refine: Int,
      dim: Int,
      nComps: Int,
      iters: Int): DataFrame = {
    val comps = powerComponents(covarianceMatrix(corpus, vecCol, dim), nComps, iters)
    val cp = project(corpus, idCol, vecCol, comps)
    val qp = project(queries, idCol, vecCol, comps)
    val pcols = (0 until nComps).map(c => s"p$c")
    val cSide = cp.select(
      col("id").as("neighbor_id") +: pcols.map(p => col(p).as(s"c_$p")): _*)
    val qSide = qp.select(
      col("id").as("query_id") +: pcols.map(p => col(p).as(s"q_$p")): _*)
    val dist2 = pcols.map(p => (col(s"q_$p") - col(s"c_$p")) * (col(s"q_$p") - col(s"c_$p")))
      .reduce(_ + _)
    val cands = cSide.join(broadcast(qSide),
        col("query_id") =!= col("neighbor_id"))
      .withColumn("nd", round(-dist2, 6)) // negate: topKPerQuery ranks desc
    val shortlist = Similarity.topKPerQuery(cands, "nd", refine)
      .select(col("query_id"), col("neighbor_id"))
    val raw = corpus.select(col(idCol).as("neighbor_id"),
      Similarity.asDouble(col(vecCol)).as("cv"))
    val qraw = queries.select(col(idCol).as("query_id"),
      Similarity.asDouble(col(vecCol)).as("qv"))
    graft.functions.VectorExpressions.register(queries.sparkSession)
    val rescored = shortlist
      .join(raw, Seq("neighbor_id"))
      .join(broadcast(qraw), Seq("query_id"))
      .withColumn("sim", round(Similarity.cosineFast(col("qv"), col("cv")), 6))
    Similarity.topKPerQuery(rescored, "sim", k)
      .select("query_id", "neighbor_id", "sim", "rnk")
  }
}
