package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram^α negative-sampling table (Mikolov et al. 2013, word2vec §2.2):
  * p_neg(w) = c_w^α / Σ_v c_v^α with α = 0.75 — the smoothed-unigram
  * distribution every contrastive text-embedding trainer draws its
  * negatives from. Raising to α < 1 upweights the tail: rare words get
  * sampled often enough to learn, stopwords stop dominating the draws.
  *
  * Scale shape: one corpus scan to the vocabulary-axis histogram, then
  * row-local pow. The only cross-row float reduction — the normalizer
  * Σ c^α — follows the house discipline: each term is 6-dp-pinned
  * immediately after its one transcendental, summed as EXACT
  * DECIMAL(28,6), and p_neg is ONE IEEE division per word against that
  * sum. The |vocab|-sized normalizer broadcasts back.
  *
  * Output: (word, freq, p_neg) — p_neg at 9 dp (tail probabilities at
  * corpus vocab sizes live at 1e-8).
  */
object NegativeSampling {

  def table(df: DataFrame, textCol: Column, alpha: Double = 0.75): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha in (0,1]: $alpha")
    val hist = UnigramLm.wordHistogram(df, textCol)
    val t = hist.withColumn("__t", round(pow(col("freq").cast("double"), alpha), 6))
    val z = t.agg(sum(col("__t").cast("decimal(28,6)")).as("__z"))
    t.crossJoin(broadcast(z)) // one-row normalizer
      .select(col("word"), col("freq"),
        round(col("__t") / col("__z").cast("double"), 9).as("p_neg"))
  }
}
