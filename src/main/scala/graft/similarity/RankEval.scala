package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ranking-quality evaluation for ANN heads: nDCG@k and MRR against exact
  * brute-force truth — the two order-sensitive companions to
  * [[Similarity.recallAtK]] (recall says WHETHER the true neighbors were
  * found; nDCG says WHERE in the list they landed; MRR tracks the single
  * most important position, the true nearest neighbor). Every production
  * retrieval deployment reports all three.
  *
  * Relevance is binary on membership in the exact top-k (the standard ANN
  * evaluation protocol): DCG = Σ 1/log2(approx_rank+1) over true neighbors
  * the approximate head returned, IDCG = Σ_{i=1..n_true} 1/log2(i+1), and
  * MRR = 1/approx_rank of the exact rank-1 neighbor (0 when the head
  * missed it entirely).
  *
  * Scale shape: identical to recallAtK — both inputs are top-k lists, so
  * every frame here lives on the |queries|·k axis regardless of corpus
  * size; one equi-join and one decomposable aggregate. The per-position
  * gain table 1/log2(i+1) is precomputed on the driver as k literal
  * doubles and interpolated verbatim into the DuckDB oracle, so both
  * engines score with bit-identical constants instead of trusting two
  * libms to agree on log2.
  *
  * Output: (query_id, n_true, ndcg, mrr) — n_true = what the exact head
  * actually returned (< k is possible), ndcg/mrr rounded to 6 dp.
  */
object RankEval {

  /** Gain for 1-based rank i under binary relevance. */
  def gain(i: Int): Double = 1.0 / (math.log(i + 1.0) / math.log(2.0))

  def rankEval(approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val gainOf: Seq[(Int, Double)] = (1 to k).map(i => i -> gain(i))
    def gainExpr(rank: org.apache.spark.sql.Column) =
      gainOf.foldLeft(lit(0.0)) { case (acc, (i, g)) =>
        when(rank === i, lit(g)).otherwise(acc)
      }
    val a = approx.filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk").as("a_rnk"))
    exact.filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk").as("e_rnk"))
      .join(a, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(
        count(lit(1)).as("n_true"),
        sum(when(col("a_rnk").isNotNull, gainExpr(col("a_rnk")))
          .otherwise(lit(0.0))).as("__dcg"),
        sum(gainExpr(col("e_rnk"))).as("__idcg"),
        max(when(col("e_rnk") === 1 && col("a_rnk").isNotNull,
          lit(1.0) / col("a_rnk").cast("double")).otherwise(lit(0.0))).as("__rr"))
      .select(col("query_id"), col("n_true"),
        round(col("__dcg") / col("__idcg"), 6).as("ndcg"),
        round(col("__rr"), 6).as("mrr"))
  }
}
