package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Per-group quota cap — the RefinedWeb/C4-style "at most N documents per
  * domain" curation rule (beyond-reference): a handful of boilerplate-heavy
  * domains otherwise dominate a crawl corpus. Selection within a group is
  * by deterministic 60-bit content-hash rank — RNG-free, reproducible on
  * any cluster layout, and STABLE under incremental ingest in the capped
  * regime: a kept document only loses its slot to a new arrival that
  * hash-ranks below it, never to a reshuffle.
  *
  * Scale shape: the naive plan windows the WHOLE corpus by group
  * (`row_number` over every row — a full shuffle plus a per-domain sort,
  * with the hottest domain as the straggler). Here only rows of OVER-CAP
  * groups are ranked: a count aggregate (map-side combined) finds groups
  * over quota — at most |corpus|/cap of them, in practice the few heavy
  * domains — and everything else passes through with no window at all.
  * The rank window then runs on the heavy-domain slice only, which also
  * bounds the skew the sort sees.
  */
object QuotaCap {

  /** Keep at most `cap` rows per `groupCol`, chosen by ascending
    * hash60(keyCol) with the key as tie-break.
    */
  def capPerGroup(df: DataFrame, keyCol: String, groupCol: String, cap: Int): DataFrame = {
    require(cap > 0, "cap must be positive")
    val overCap = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__gn"))
      .filter(col("__gn") > cap)
      .select(col(groupCol))
    val under = df.join(overCap, Seq(groupCol), "left_anti")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(TextFunctions.hash60(col(keyCol).cast("string")), col(keyCol))
    val capped = df.join(overCap, Seq(groupCol))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap)
      .drop("__rn")
    under.unionByName(capped).select(df.columns.map(col).toSeq: _*)
  }
}
