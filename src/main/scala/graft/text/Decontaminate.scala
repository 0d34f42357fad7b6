package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Benchmark decontamination for training corpora (beyond-reference, builder
  * prompt): flag training documents that share verbatim word n-grams with an
  * evaluation/benchmark set — the standard pre-training overlap filter
  * (the 8/13-gram checks of the GPT-3 and PaLM data pipelines).
  *
  * Scale shape: the benchmark's distinct n-gram set is the SMALL side by
  * definition (eval suites are fixed-size while the corpus grows), so it
  * broadcasts; the corpus explodes to (doc, gram) pairs ONCE and probes the
  * broadcast set — no corpus-sized shuffle, and the per-doc aggregate is
  * map-side combined. At 100 TB this is one scan of the corpus.
  */
object Decontaminate {

  /** Per-document n-gram overlap report against the benchmark subset.
    *
    * @param benchPred rows satisfying this predicate form the benchmark set;
    *                  they are excluded from the report (a benchmark doc is
    *                  trivially contaminated by itself)
    * @return (id, n_overlap, n_grams, overlap_ratio) for training docs with
    *         at least one verbatim shared n-gram
    */
  def ngramOverlap(docs: DataFrame, idCol: String, textCol: String,
      benchPred: Column, n: Int = 8): DataFrame = {
    val grams = docs.select(col(idCol).as("id"), benchPred.as("is_bench"),
      explode(Dedup.shingles(col(textCol), n)).as("g"))
    val bench = grams.filter(col("is_bench")).select(col("g")).distinct()
    grams.filter(!col("is_bench"))
      .join(broadcast(bench.withColumn("__hit", lit(1))), Seq("g"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__hit"), lit(0))).cast("long").as("n_overlap"))
      .filter(col("n_overlap") > 0)
      .select(col("id"), col("n_overlap"), col("n_grams"),
        round(col("n_overlap") / col("n_grams"), 6).as("overlap_ratio"))
  }

  /** Cross-document duplicated-span statistics (the corpus-level overlap
    * signal CCNet-style pipelines use to strip shared boilerplate): for
    * each document, the fraction of its distinct n-grams that occur in at
    * least one OTHER document. Documents shorter than n tokens are omitted
    * (they have no n-grams).
    *
    * Scale shape: the corpus explodes to distinct (doc, gram) pairs once;
    * the gram-axis count is a map-side-combined aggregate (rows are
    * already distinct per doc, so `count(*)` per gram IS the containing-doc
    * count); the join back keys on the gram axis — vocabulary-sized, so it
    * shuffles rather than broadcasts, sharded by gram hash with no hot key
    * beyond genuinely universal phrases (which are exactly what the signal
    * measures). Two corpus-sized shuffles total, both on well-spread keys.
    */
  def crossDupStats(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 8): DataFrame = {
    val grams = docs.select(col(idCol).as("id"),
      explode(Dedup.shingles(col(textCol), n)).as("g"))
    val counts = grams.groupBy(col("g")).agg(count(lit(1)).as("__ndocs"))
    grams.join(counts, Seq("g"))
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_grams"),
        sum((col("__ndocs") > 1).cast("int")).cast("long").as("n_shared"))
      .select(col("id"), col("n_shared"), col("n_grams"),
        round(col("n_shared") / col("n_grams"), 6).as("shared_ratio"))
  }
}
