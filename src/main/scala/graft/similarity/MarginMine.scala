package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Similarity.{asDouble, cosineFast, topKPerQuery}

/** Margin-based mutual-kNN pair mining — Artetxe & Schwenk 2019
  * ("Margin-based Parallel Corpus Mining with Multilingual Sentence
  * Embeddings", public paper): the CCMatrix/NLLB-class alignment operator
  * that pairs items from two embedding sides (two languages, two crawl
  * dumps, text↔image captions) by RATIO MARGIN rather than raw cosine.
  *
  * Raw-cosine thresholds fail on hubness: a generic vector is everyone's
  * near-neighbor. The ratio margin normalizes each candidate similarity by
  * the mean similarity of both endpoints' own k-NN lists,
  *
  *     margin(x, y) = cos(x, y) / ( (Σ_{z∈NNk(x)} cos(x,z)
  *                                 + Σ_{z∈NNk(y)} cos(y,z)) / 2k )
  *
  * so a pair only scores high when it stands OUT of both neighborhoods.
  * A pair is emitted when y ∈ NNk(x), x ∈ NNk(y) (mutual), margin ≥
  * threshold, and y is x's argmax-margin candidate (the standard
  * best-pair extraction).
  *
  * Scale shape (gate head = exact brute force, production head pluggable):
  *   - side A (the query side) is bounded and BROADCASTS; side B streams
  *     past in one scan for the forward lists — identical discipline to
  *     [[Similarity.bruteForceTopK]], salted two-stage top-k, never a
  *     corpus-sized window sort;
  *   - the backward pass runs ONLY for forward candidates (≤ |A|·k rows,
  *     joined back to their vectors by id), against the broadcast A side —
  *     so the second direction is bounded × bounded regardless of |B|;
  *   - at 100 TB with BOTH sides corpus-scale, swap the two scored heads
  *     for the IVF/PQ candidate generators ([[Similarity]]); the sum,
  *     mutuality, and margin stages below are head-agnostic;
  *   - REDUCTION-ORDER-PROOF margins: per-list sims are 6-dp-pinned
  *     doubles summed as exact DECIMAL(28,6); margin = ONE IEEE division
  *     of sim·2k (exact decimal) by (sumA + sumB) (exact decimal), then a
  *     6-dp pin — bit-identical across engines and partition layouts.
  *
  * Output: (query_id, neighbor_id, sim, margin) — one best pair per
  * side-A id that survives mutuality + threshold; ties on the 6-dp margin
  * break to the smaller neighbor id.
  */
object MarginMine {

  /** Mine best margin pairs from bounded side `a` into side `b`.
    * `a` and `b` must have disjoint id spaces (callers split one table by
    * parity/label/source — a shared id would pair a row with itself).
    */
  def mineMutual(
      a: DataFrame,
      b: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      threshold: Double): DataFrame = {
    graft.functions.VectorExpressions.register(a.sparkSession)
    val qa = a.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val cb = b.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))

    // forward: per side-A id, top-k over side B (corpus scan, A broadcast)
    val fwd = topKPerQuery(
      cb.crossJoin(broadcast(qa))
        .withColumn("sim", round(cosineFast(col("qv"), col("cv")), 6)),
      "sim", k)
      .select("query_id", "neighbor_id", "sim")
    val sumA = fwd.groupBy("query_id")
      .agg(sum(col("sim").cast("decimal(28,6)")).as("suma"))

    // backward: only forward candidates need lists; they are ≤ |A|·k ids,
    // re-joined to their vectors and ranked against the bounded A side
    val candQ = fwd.select(col("neighbor_id")).distinct()
      .join(cb, "neighbor_id")
      .select(col("neighbor_id").as("query_id"), col("cv").as("qv"))
    val bwd = topKPerQuery(
      qa.select(col("query_id").as("neighbor_id"), col("qv").as("cv"))
        .crossJoin(broadcast(candQ))
        .withColumn("sim", round(cosineFast(col("qv"), col("cv")), 6)),
      "sim", k)
      .select(col("query_id").as("b_id"), col("neighbor_id").as("a_id"),
        col("sim"))
    val sumB = bwd.groupBy(col("b_id"))
      .agg(sum(col("sim").cast("decimal(28,6)")).as("sumb"))

    // mutual pairs + margin; one best per side-A id (salted two-stage)
    val mutual = fwd
      .join(bwd.select(col("a_id").as("query_id"), col("b_id").as("neighbor_id")),
        Seq("query_id", "neighbor_id"))
      .join(sumA, "query_id")
      .join(sumB.withColumnRenamed("b_id", "neighbor_id"), "neighbor_id")
      .withColumn("margin", round(
        (col("sim").cast("decimal(28,6)") * lit(2 * k)).cast("double") /
          (col("suma") + col("sumb")).cast("double"), 6))
      .filter(col("margin") >= threshold)
    topKPerQuery(mutual, "margin", 1)
      .select("query_id", "neighbor_id", "sim", "margin")
  }
}
