package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** UniMax per-language budget allocation (Chung et al. 2023, "UniMax:
  * Fairer and More Effective Language Sampling for Large-Scale Multilingual
  * Pretraining"): distribute a total token budget B across languages as
  * uniformly as possible, subject to a per-language repeat cap — no
  * language contributes more than `maxEpochs` passes over its available
  * tokens. This is the budget-scheduling step between the mixture family
  * ([[Mixture]] temperature weights reshape SHARES; UniMax assigns absolute
  * BUDGETS under an epoch constraint) and the samplers that consume the
  * allocation.
  *
  * Water-filling, closed-form on the sorted language axis: with caps
  * cap_l = maxEpochs·tokens_l sorted ascending, language i is capped iff
  *     cap_i·(L − i + 1) + prefix_{i−1} ≤ B
  * (all-integer — exact in any engine), and every uncapped language gets
  * the common water level t = (B − Σ_{capped} cap) / (L − #capped), one
  * double division of two exact integers.
  *
  * Scale shape: ONE aggregate reduces the corpus to the |languages| axis (a
  * handful of rows — the only data-sized work); the sort/cumsum windows run
  * on that bounded axis, and the two scalars join back via a one-row
  * cross-join. Row count and shuffle width are |languages|, independent of
  * corpus size.
  *
  * Output: (lang, n_tokens, cap, capped, alloc, epochs), alloc/epochs
  * 6-dp-pinned. If B ≥ Σ cap, every language is capped and the surplus
  * stays unallocated (UniMax's own behavior — nothing left to repeat).
  */
object UniMax {

  def allocate(
      docs: DataFrame,
      langCol: String,
      tokens: Column,
      budget: Long,
      maxEpochs: Int): DataFrame = {
    val per = docs.groupBy(col(langCol).as("lang"))
      .agg(sum(tokens).as("n_tokens"))
      .withColumn("cap", col("n_tokens") * maxEpochs)
    // bounded-axis windows: |languages| rows total, one task is the point
    val w = Window.orderBy(col("cap").asc, col("lang").asc)
    val ranked = per
      .withColumn("i", row_number().over(w))
      .withColumn("prefix", sum(col("cap")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(per.agg(count(lit(1)).as("nl"))) // one scalar row
      .withColumn("capped",
        col("cap") * (col("nl") - col("i") + 1) + (col("prefix") - col("cap"))
          <= budget)
    val fill = ranked.agg(
      sum(when(col("capped"), lit(1)).otherwise(lit(0))).as("ncap"),
      coalesce(max(when(col("capped"), col("prefix"))), lit(0L)).as("prefcap"))
    ranked.crossJoin(fill) // one scalar row
      .withColumn("t",
        (lit(budget) - col("prefcap")).cast("double") / (col("nl") - col("ncap")))
      .select(col("lang"), col("n_tokens"), col("cap"), col("capped"),
        round(when(col("capped"), col("cap").cast("double")).otherwise(col("t")), 6)
          .as("alloc"))
      .withColumn("epochs", round(col("alloc") / col("n_tokens"), 6))
  }
}
