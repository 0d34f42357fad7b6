package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169; beyond-reference training-data op): score every source
  * document by how much more likely its hashed bag-of-token features are
  * under a TARGET distribution (the domain you want more of — a benchmark,
  * a curated seed corpus) than under the raw SOURCE distribution, then keep
  * the top-weighted documents.
  *
  * Features are token hash buckets (the paper's hashed n-grams): bucket
  * b(t) = hash60(t) mod B, with B small (default 1024). Both distributions
  * are add-one-smoothed multinomials over the B buckets, so a document's
  * importance log-weight telescopes exactly like [[NaiveBayes]]:
  *     logw(d) = Σ_i [ln(c_T[b_i]+1) − ln(c_S[b_i]+1)]
  *               − n_d·[ln(T_T+B) − ln(T_S+B)]
  * where c_T/c_S are bucket counts and T_T/T_S total token counts of the
  * target/source sides.
  *
  * Scale shape: ONE corpus scan builds the bucket table — a ≤B-row frame
  * (B is a constant, 1024) that BROADCASTS to the scoring join, unlike the
  * NB model whose vocabulary axis must shard. The per-doc aggregate is
  * map-side combined; totals are one scalar row. Selection is
  * `TakeOrderedAndProject` (per-partition heaps, k rows to the driver) —
  * no global sort.
  */
object Dsir {

  /** Per-source-document importance log-weight (rounded to 6):
    * (id, n_toks, logw) for every doc NOT matching `targetPred`.
    */
  def logWeights(docs: DataFrame, idCol: String, textCol: String,
      targetPred: Column, nBuckets: Int = 1024): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive (got $nBuckets)")
    // NULL-proof the predicate: a NULL targetPred row is a source doc, not
    // a silent drop from filter(!is_target) under three-valued logic
    val toks = docs
      .select(col(idCol).as("id"), coalesce(targetPred, lit(false)).as("is_target"),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .withColumn("b", pmod(TextFunctions.hash60(col("tok")), lit(nBuckets.toLong)))
    val buckets = toks.groupBy(col("b")).agg(
      sum(when(col("is_target"), 1L).otherwise(0L)).as("ct"),
      sum(when(col("is_target"), 0L).otherwise(1L)).as("cs"))
    val lw = buckets.select(col("b"),
      (log(col("ct").cast("double") + 1) - log(col("cs").cast("double") + 1)).as("lw"))
    val totals = buckets.agg(
      log(sum(col("ct")).cast("double") + nBuckets).as("lt"),
      log(sum(col("cs")).cast("double") + nBuckets).as("ls"))
    toks.filter(!col("is_target"))
      .join(broadcast(lw), Seq("b"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_toks"), sum(col("lw")).as("s"))
      .crossJoin(totals) // one scalar row
      .select(col("id"), col("n_toks"),
        round(col("s") - col("n_toks") * (col("lt") - col("ls")), 6).as("logw"))
  }

  /** The selection step: top-k source docs by importance weight,
    * deterministic tie-break on id. k rows total reach the driver
    * (TakeOrdered), never a global sort.
    */
  def select(docs: DataFrame, idCol: String, textCol: String,
      targetPred: Column, k: Int, nBuckets: Int = 1024): DataFrame =
    logWeights(docs, idCol, textCol, targetPred, nBuckets)
      .orderBy(col("logw").desc, col("id"))
      .limit(k)
}
