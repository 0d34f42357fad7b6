package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cluster-quality diagnostics over the deterministic distributed k-means
  * ([[Similarity.kmeansCentroids]]): simplified silhouette and a
  * centroid-distance outlier screen — the two signals a curation pipeline
  * reads before trusting SemDeDup / cluster-balanced sampling decisions
  * built on the same clustering.
  *
  * The TRUE silhouette needs all-pairs distances — Θ(n²) and a non-starter
  * at corpus scale. The standard scale substitute (Hruschka et al. 2004,
  * "simplified silhouette") replaces mean-distance-to-cluster with
  * distance-to-centroid: a(x) = ‖x − c_own‖, b(x) = min over other
  * centroids ‖x − c‖, s(x) = (b − a) / max(a, b). That is O(n·k) in one
  * corpus scan with the k centroids shipped as literals — no join, no
  * shuffle before the |clusters|-axis aggregate.
  *
  * Cluster assignment replays the engine's clustering rule exactly
  * ([[Similarity.ivfListWith]]: max dot product, ties to the lowest
  * centroid index), so the diagnostic scores the SAME partition SemDeDup
  * and clusterBalance act on; distances are L2 via the identity
  * ‖x−c‖² = x·x − 2·x·c + c·c with every dot the sequential fold both
  * engines share and c·c a driver-computed literal.
  */
object Silhouette {

  /** Per-point frame: (id, cluster, a2, b2, sil) — a2/b2 raw squared
    * distances, sil rounded to 6 dp. Internal building block for both
    * gates; one corpus scan, zero shuffle.
    */
  private def perPoint(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      cents: Seq[Seq[Double]]): DataFrame = {
    val v = corpus.select(col(idCol).as("__id"),
        Similarity.asDouble(col(vecCol)).as("__dv"))
      .withColumn("cluster", Similarity.ivfListWith(col("__dv"), cents))
      .withColumn("__xx", Similarity.dot(col("__dv"), col("__dv")))
    val d2s: Seq[Column] = cents.map { cent =>
      val ca = array(cent.map(lit): _*)
      col("__xx") - lit(2.0) * Similarity.dot(col("__dv"), ca) +
        lit(cent.map(x => x * x).sum)
    }
    val a2 = d2s.zipWithIndex.foldLeft(lit(Double.NaN)) {
      case (acc, (d2, c)) => when(col("cluster") === c, d2).otherwise(acc)
    }
    val b2 = least(d2s.zipWithIndex.map { case (d2, c) =>
      when(col("cluster") === c, lit(Double.MaxValue)).otherwise(d2)
    }: _*)
    // sqrt of a float-noise negative (x ≈ centroid) would NaN; clamp at 0
    val aa = sqrt(greatest(a2, lit(0.0)))
    val bb = sqrt(greatest(b2, lit(0.0)))
    val sil = when(greatest(aa, bb) === 0.0, lit(0.0))
      .otherwise(round((bb - aa) / greatest(aa, bb), 6))
    v.select(col("__id"), col("cluster"), aa.as("__a"), sil.as("sil"))
  }

  /** Per-cluster simplified-silhouette report: (cluster, n_vecs, mean_sil),
    * mean over 6-dp per-point scores, rounded to 6 dp. Centroids learned by
    * the same Lloyd loop every other clustering operator uses, so the
    * DuckDB oracle replays them CTE-for-CTE.
    */
  def simplifiedSilhouette(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nLists: Int,
      dim: Int,
      iters: Int): DataFrame = {
    val cents = Similarity.kmeansCentroids(corpus, vecCol, nLists, dim, iters)
    perPoint(corpus, idCol, vecCol, cents)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_vecs"), round(avg(col("sil")), 6).as("mean_sil"))
      .orderBy(col("cluster"))
  }

  /** Centroid-distance outlier screen: flag vectors whose distance to
    * their own centroid sits more than `zThr` population standard
    * deviations above the cluster mean — mislabeled/garbage embeddings a
    * pipeline prunes before similarity search indexes them. Variance uses
    * the explicit-moments formula var = Σd²/n − mean² (identical text in
    * the oracle — never each engine's own streaming stddev), distances
    * pinned to 6 dp before the moments so both engines aggregate the same
    * values. Two corpus scans (moments, then flags); the |clusters|-axis
    * stats frame broadcasts back.
    *
    * Output: (id, cluster, dist, z, flagged) for every vector.
    */
  def outlierScreen(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nLists: Int,
      dim: Int,
      iters: Int,
      zThr: Double): DataFrame = {
    val cents = Similarity.kmeansCentroids(corpus, vecCol, nLists, dim, iters)
    val pts = perPoint(corpus, idCol, vecCol, cents)
      .select(col("__id"), col("cluster"), round(col("__a"), 6).as("dist"))
    val stats = pts.groupBy(col("cluster"))
      .agg(count(lit(1)).as("__n"), sum(col("dist")).as("__s"),
        sum(col("dist") * col("dist")).as("__s2"))
      .select(col("cluster"),
        (col("__s") / col("__n")).as("__mean"),
        sqrt(greatest(
          col("__s2") / col("__n") - (col("__s") / col("__n")) * (col("__s") / col("__n")),
          lit(0.0))).as("__sd"))
    pts.join(broadcast(stats), Seq("cluster"))
      .select(col("__id").as(idCol), col("cluster"), col("dist"),
        when(col("__sd") === 0.0, lit(0.0))
          .otherwise(round((col("dist") - col("__mean")) / col("__sd"), 6)).as("z"))
      .withColumn("flagged", col("z") > zThr)
  }
}
