package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-source overlap matrix (beyond-reference training-data op): for
  * every pair of corpus sources, the number of distinct word n-grams both
  * contain and the Jaccard overlap of their gram sets. This is the
  * inter-dump / inter-source dedup decision input — e.g. successive
  * Common-Crawl snapshots overlap heavily and the matrix quantifies how
  * much a cross-source dedup pass would remove, per pair, before anyone
  * pays for it (complements the per-source `q_source_cardinality` card and
  * the per-doc `crossDupStats`).
  *
  * Scale shape: distinct (source, gram) pairs come from one scan + a
  * map-side-combined distinct; the per-gram source set is bounded by
  * |sources| (a handful), so the pair fan-out is ≤ C(|sources|, 2) rows per
  * gram — NO gram-axis self-join (a self-join on the gram key would hit the
  * same Zipf-hot boilerplate grams from both sides). Per-source totals are
  * a |sources|-row frame, broadcast back. The only big shuffles are the two
  * gram-axis aggregates, both combine map-side.
  *
  * Output: (source_a, source_b, n_shared, jaccard) for pairs with ≥ 1
  * shared gram, source_a < source_b.
  */
object SourceOverlap {

  def overlapMatrix(
      docs: DataFrame,
      textCol: String,
      sourceCol: String,
      n: Int): DataFrame = {
    val t = split(col(textCol), " ")
    val grams = when(size(t) >= n,
      transform(sequence(lit(0), size(t) - n),
        i => concat_ws(" ", slice(t, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
    val sg = docs
      .select(col(sourceCol).as("source"), explode(grams).as("g"))
      .distinct()
    val perSource = sg.groupBy(col("source")).agg(count(lit(1)).as("n_grams"))
    // per-gram source set: bounded by |sources|; sort for determinism, then
    // expand ordered pairs (each element with every later one)
    val pairs = sg
      .groupBy(col("g"))
      .agg(sort_array(collect_set(col("source"))).as("ss"))
      .filter(size(col("ss")) > 1)
      .select(explode(flatten(transform(col("ss"), (x, i) =>
        transform(slice(col("ss"), i + lit(2), size(col("ss"))),
          y => struct(x.as("source_a"), y.as("source_b")))))).as("p"))
      .groupBy(col("p.source_a").as("source_a"), col("p.source_b").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
    val pa = perSource.select(col("source").as("source_a"), col("n_grams").as("na"))
    val pb = perSource.select(col("source").as("source_b"), col("n_grams").as("nb"))
    pairs
      .join(broadcast(pa), Seq("source_a"))
      .join(broadcast(pb), Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("n_shared"),
        round(col("n_shared").cast("double") /
          (col("na") + col("nb") - col("n_shared")), 6).as("jaccard"))
  }
}
