package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dedup-head quality evaluation IN-ENGINE — the pair-set analog of
  * [[graft.similarity.Similarity.recallAtK]]: precision/recall/F1 of a
  * candidate near-dup head (capped MinHash-LSH, banded SimHash, …)
  * against exact truth. What makes this practical at scale is that the
  * truth side no longer requires an offline Θ(n²) pass:
  * [[PrefixJoin.jaccardPrefixJoin]] produces the EXACT pair set with
  * prefix-filter pruning, so "measure the head you deploy against the
  * truth" becomes one composed plan a pipeline can run per corpus
  * snapshot (tune bands/caps per corpus instead of trusting constants
  * measured elsewhere — SCALE.md's per-corpus head-selection rule, now an
  * operator instead of a tool).
  *
  * Scale shape: both inputs are pair frames (bounded by the heads'
  * own output discipline); dedupe + one equi-join on (id_a, id_b) + three
  * global counting aggregates → a single summary row. Ratios are single
  * IEEE divisions of exact integer counts, identical text in the oracle.
  *
  * Output: one row (n_truth, n_cand, n_hit, precision, recall, f1).
  */
object DedupEval {

  def pairSetEval(cand: DataFrame, truth: DataFrame): DataFrame = {
    val c = cand.select(col("id_a"), col("id_b")).distinct()
    val t = truth.select(col("id_a"), col("id_b")).distinct()
    val hit = t.join(c.withColumn("__h", lit(1L)), Seq("id_a", "id_b"), "left")
      .agg(count(lit(1)).as("n_truth"),
        sum(coalesce(col("__h"), lit(0L))).as("n_hit"))
    val nc = c.agg(count(lit(1)).as("n_cand"))
    val p = when(col("n_cand") === 0, 0.0)
      .otherwise(col("n_hit").cast("double") / col("n_cand"))
    val r = when(col("n_truth") === 0, 0.0)
      .otherwise(col("n_hit").cast("double") / col("n_truth"))
    hit.crossJoin(nc) // two single-row frames
      .select(col("n_truth"), col("n_cand"), col("n_hit"),
        round(p, 6).as("precision"), round(r, 6).as("recall"),
        round(when(p + r === 0.0, 0.0).otherwise(lit(2.0) * p * r / (p + r)), 6).as("f1"))
  }
}
