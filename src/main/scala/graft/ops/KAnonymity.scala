package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** k-anonymity screening (Sweeney 2002) for released tables — the
  * compliance check next to the Laplace-noised release ([[DpRelease]]):
  * a record is k-anonymous when at least k−1 other records share its
  * quasi-identifier tuple, so any group smaller than k re-identifies.
  *
  * Shape: one groupBy on the quasi-identifier tuple (the only pass over
  * the data), then a bounded per-stratum rollup — group sizes, violating
  * groups, records at risk, and the achieved k (the minimum group size).
  * Everything integer; generalization (coarsening a column until the
  * check passes) is the caller's loop over this same aggregate.
  */
object KAnonymity {

  /** Per-stratum k-anonymity report. `quasiCols` define the adversary's
    * assumed background knowledge; `stratumCol` buckets the report (pass
    * `lit("ALL")` for a single row).
    */
  def report(
      df: DataFrame,
      stratumCol: Column,
      quasiCols: Seq[Column],
      k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2: $k")
    val groups = df.groupBy(stratumCol.as("stratum") +: quasiCols: _*)
      .agg(count(lit(1)).as("sz"))
    groups.groupBy(col("stratum"))
      .agg(
        count(lit(1)).as("n_groups"),
        sum(col("sz")).as("n_records"),
        sum(when(col("sz") < k, lit(1L)).otherwise(lit(0L))).as("n_violating_groups"),
        sum(when(col("sz") < k, col("sz")).otherwise(lit(0L))).as("n_records_at_risk"),
        min(col("sz")).as("k_achieved"))
      .withColumn("k_required", lit(k.toLong))
      .withColumn("anonymous", col("k_achieved") >= k)
      .orderBy("stratum")
  }
}
