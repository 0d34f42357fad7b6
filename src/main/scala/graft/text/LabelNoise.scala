package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Confident-learning label-noise screen — Northcutt, Jiang & Chuang 2021
  * ("Confident Learning: Estimating Uncertainty in Dataset Labels", public
  * paper): given a classifier's per-(example, class) scores and the
  * OBSERVED (possibly wrong) labels, flag examples whose predicted class
  * membership confidently disagrees with their label. This is the label-
  * hygiene pass over a weakly-labeled corpus (source-as-label quality
  * tiers, lang-ID seed sets) before the labels train anything downstream.
  *
  * Chain (all per-example axes bounded by |classes|):
  *   1. softmax posteriors from the raw log-scores: p_raw = exp(s − max_s)
  *      pinned at 9 dp, normalized by the exact DECIMAL(28,9) sum, final
  *      6-dp pin — ONE transcendental per cell, reduction-order-proof;
  *   2. per-class self-confidence threshold t_j = mean of p_j over the
  *      examples OBSERVED as j (exact DECIMAL(28,6) sum, one IEEE
  *      division) — the confident-joint row rule of the paper;
  *   3. an example is assigned to the class with the largest p_j among
  *      those with p_j ≥ t_j (decomposable max(struct) argmax, ties to
  *      the larger label); no class qualifying → the example keeps its
  *      observed label and is unflagged;
  *   4. flagged ⇔ assigned class ≠ observed label.
  *
  * [[screen]] scores whatever the caller provides; the paper computes
  * out-of-sample predicted probabilities (cross-val). [[oofScores]] IS
  * that faithful variant — hash-fold CV over the NB posterior surface —
  * and `q_label_noise_oof` gates it; the in-sample `q_label_noise` gate
  * stays as the cheap single-model screen.
  *
  * Scale shape: two grouped aggregates on the example axis (max, sum),
  * one |classes|-sized threshold frame broadcast back, one argmax
  * aggregate. No window, no self-join, nothing driver-side.
  *
  * Output: (id, observed, suggested, p_sugg, flagged); p_sugg is NULL for
  * unflagged examples with no qualifying class.
  */
object LabelNoise {

  /** `scores`: (id, label, score) — one row per example × class;
    * `observed`: (id, y).
    */
  /** Out-of-fold NB posterior surface — the paper-faithful input to
    * [[screen]]: fold membership is a pure function of the row id
    * (hash60 mod nFolds — RNG-free, layout-independent, the same
    * discipline every sampler here uses), each fold is scored by a model
    * trained on its complement, and the union covers every row exactly
    * once. Cost is nFolds model builds (nFolds corpus scans) — the
    * standard CV price; each per-fold chain keeps [[NaiveBayes.scores]]'s
    * scale shape (sparse (label, token) model never collected).
    */
  def oofScores(df: DataFrame, idCol: String, labelCol: String,
      textCol: String, nFolds: Int): DataFrame = {
    require(nFolds >= 2, s"nFolds >= 2: $nFolds")
    val withFold = df.withColumn("__fold",
      pmod(TextFunctions.hash60(col(idCol).cast("string")), lit(nFolds.toLong)))
    (0 until nFolds).map { f =>
      NaiveBayes.scores(
        withFold.filter(col("__fold") =!= f),
        withFold.filter(col("__fold") === f), idCol, labelCol, textCol)
    }.reduce(_ unionByName _)
  }

  def screen(scores: DataFrame, observed: DataFrame): DataFrame = {
    val mx = scores.groupBy("id").agg(max(col("score")).as("mxs"))
    val praw = scores.join(mx, "id")
      .withColumn("praw", round(exp(col("score") - col("mxs")), 9))
    val z = praw.groupBy("id").agg(sum(col("praw").cast("decimal(28,9)")).as("z"))
    val p = praw.join(z, "id")
      .withColumn("p", round(col("praw") / col("z").cast("double"), 6))
      .select("id", "label", "p")
    val thr = p.join(observed, "id").filter(col("label") === col("y"))
      .groupBy(col("label"))
      .agg(round(sum(col("p").cast("decimal(28,6)")).cast("double") /
        count(lit(1)), 6).as("t"))
    val best = p.join(broadcast(thr), "label").filter(col("p") >= col("t"))
      .groupBy("id").agg(max(struct(col("p"), col("label"))).as("b"))
      .select(col("id"), col("b.label").as("sugg"), col("b.p").as("p_sugg"))
    observed.join(best, Seq("id"), "left")
      .select(col("id"), col("y").as("observed"),
        coalesce(col("sugg"), col("y")).as("suggested"), col("p_sugg"),
        (coalesce(col("sugg"), col("y")) =!= col("y")).as("flagged"))
  }
}
