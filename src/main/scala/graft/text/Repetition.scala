package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style within-document repetition signals (beyond-reference,
  * builder prompt): the standard quality filters that catch boilerplate and
  * degenerate generation loops in pre-training corpora (the "repetition"
  * family of the Gopher/MassiveText rules).
  *
  * Two signals per document over word n-grams:
  *  - top-n-gram char fraction: chars covered by the single most repeated
  *    n-gram (count × its length) / total chars — high means one phrase
  *    dominates the doc;
  *  - dup-n-gram fraction: fraction of n-gram OCCURRENCES whose gram
  *    appears more than once — high means the doc is self-similar.
  *
  * Scale shape: explode to (doc, gram) once per n, `groupBy(doc, gram)`
  * count (decomposable → map-side combined), then a per-doc reduce. Both
  * aggregates and the final joins key on doc_id, so after the first
  * shuffle the plan stays co-partitioned. No UDFs — the gram construction
  * is the same codegen'd HOF as [[TextFunctions.ngrams]].
  */
object Repetition {

  /** Per-document repetition report.
    *
    * @param topN n-gram size for the top-gram char fraction (Gopher uses
    *             2–4)
    * @param dupN n-gram size for the duplicate-occurrence fraction (Gopher
    *             uses 5–10)
    * @return (doc_id, top_char_frac, dup_frac) for every input document;
    *         a doc too short to have any n-gram scores 0 on that signal
    */
  def ngramStats(docs: DataFrame, idCol: String, textCol: String,
      topN: Int = 2, dupN: Int = 5): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
      col(textCol).as("__text"), length(col(textCol)).as("__chars"))

    def gramCounts(n: Int): DataFrame = base
      .select(col("doc_id"), explode(TextFunctions.ngrams(col("__text"), n)).as("g"))
      .groupBy(col("doc_id"), col("g"))
      .agg(count(lit(1)).as("c"))

    val top = gramCounts(topN).groupBy(col("doc_id"))
      .agg(max(col("c") * length(col("g"))).as("__topchars"))
    val dup = gramCounts(dupN).groupBy(col("doc_id"))
      .agg(sum(when(col("c") > 1, col("c")).otherwise(0L)).as("__dup"),
        sum(col("c")).as("__tot"))

    base.join(top, Seq("doc_id"), "left")
      .join(dup, Seq("doc_id"), "left")
      .select(col("doc_id"),
        round(coalesce(col("__topchars"), lit(0L)) / col("__chars"), 6)
          .as("top_char_frac"),
        round(coalesce(col("__dup"), lit(0L)) / coalesce(col("__tot"), lit(1L)), 6)
          .as("dup_frac"))
  }
}
