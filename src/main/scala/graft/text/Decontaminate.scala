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
    // NULL-proof the predicate: a NULL benchPred row must count as a
    // training doc, not vanish from BOTH filter sides (filter(p) and
    // filter(!p) each drop NULLs under three-valued logic)
    val grams = docs.select(col(idCol).as("id"),
      coalesce(benchPred, lit(false)).as("is_bench"),
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

  /** Decontamination REMOVAL — the action [[ngramOverlap]]'s detection
    * feeds: mask every token covered by a benchmark-matching n-gram out of
    * the training text (the GPT-3 appendix-C discipline: remove the
    * contaminated window, keep the rest of the document).
    *
    * Scale shape: positional grams explode once (position is needed to mask,
    * so no array_distinct here); the benchmark gram set broadcasts as in
    * [[ngramOverlap]]; matched START positions aggregate per doc (bounded by
    * the doc's contamination, tiny); the final rebuild is row-local array
    * logic — tokens whose position falls inside any [start, start+n) window
    * are dropped and the survivors re-join. One corpus scan + one bounded
    * per-doc aggregate; no corpus-sized shuffle beyond it.
    *
    * Output: (id, n_tokens, n_removed, text_clean) for EVERY training doc
    * (clean docs pass through with n_removed = 0).
    */
  def removeContaminated(docs: DataFrame, idCol: String, textCol: String,
      benchPred: Column, n: Int = 8): DataFrame = {
    // coalesce for the same NULL-predicate reason as [[ngramOverlap]]
    val base = docs.select(col(idCol).as("id"),
      coalesce(benchPred, lit(false)).as("is_bench"),
      split(col(textCol), " ").as("t"))
    val grams = base.select(col("id"), col("is_bench"),
      posexplode(positionalGrams(col("t"), n)).as(Seq("i", "g")))
    val bench = grams.filter(col("is_bench")).select(col("g")).distinct()
    val maskedStarts = grams.filter(!col("is_bench"))
      .join(broadcast(bench), Seq("g"))
      .groupBy(col("id")).agg(collect_set(col("i")).as("__starts"))
    dropWindows(base.filter(!col("is_bench")), maskedStarts, n)
  }

  /** Cross-document shared-span REMOVAL (CCNet-style boilerplate strip) —
    * the action [[crossDupStats]]'s signal feeds: mask every token covered
    * by an n-gram occurring in at least `minDocs` distinct documents
    * (headers, footers, license blocks — text whose frequency across the
    * corpus marks it as template, not content).
    *
    * Scale shape: positional grams explode once; the containing-doc count
    * is a map-side-combined aggregate over the distinct (doc, gram) axis;
    * the shared-gram set joins back on the gram axis — vocabulary-sized,
    * well-spread hash keys (universal phrases are the hottest and exactly
    * the ones being removed) — then per-doc start sets aggregate (bounded
    * by each doc's boilerplate) and the rebuild is row-local. No driver
    * collect anywhere; AQE may still broadcast the shared set when the
    * corpus turns out to have little duplication.
    *
    * Output: (id, n_tokens, n_removed, text_clean) for EVERY document.
    */
  def removeSharedSpans(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 8, minDocs: Int = 2): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2 (got $minDocs): " +
      "every gram occurs in its own document, so a lower bound strips everything")
    val base = docs.select(col(idCol).as("id"), split(col(textCol), " ").as("t"))
    val grams = base.select(col("id"),
      posexplode(positionalGrams(col("t"), n)).as(Seq("i", "g")))
    val shared = grams.select(col("id"), col("g")).distinct()
      .groupBy(col("g")).agg(count(lit(1)).as("__ndocs"))
      .filter(col("__ndocs") >= minDocs).select(col("g"))
    val maskedStarts = grams.join(shared, Seq("g"))
      .groupBy(col("id")).agg(collect_set(col("i")).as("__starts"))
    dropWindows(base, maskedStarts, n)
  }

  /** Maximal cross-document shared spans — the exact substring-level dedup
    * signal of Lee et al. 2022 ("Deduplicating Training Data Makes Language
    * Models Better", the ExactSubstr operator): every maximal run of
    * `>= minTokens` consecutive tokens appearing verbatim in at least
    * `minDocs` distinct documents, reported as (id, span_start, span_len).
    *
    * Re-expressed Spark-first without a suffix array: a shared span of
    * length L >= k (k = minTokens) contains exactly its L−k+1 shared
    * k-gram start positions, and they are CONSECUTIVE; conversely a
    * maximal run of consecutive shared starts i..j certifies the maximal
    * shared span [i, j+k). So k-gram seeds + consecutive-start coalescing
    * recover the variable-length maximal spans. Maximality holds by
    * construction: a run head has no shared start at i−1 and a run tail
    * none at i+1, so no longer shared span contains the reported one.
    *
    * Scale shape: identical to [[removeSharedSpans]] — positional grams
    * explode once; the containing-doc count is a map-side-combined
    * aggregate on the gram axis; shared grams join back on the same
    * well-spread axis; per-doc start sets are bounded by doc length and
    * the run coalescing is O(doc) row-local array arithmetic (shifted-
    * neighbor compare, no per-element set scans). No driver collect.
    *
    * NOTE on semantics vs the paper: spans are CROSS-document (a phrase
    * repeated only inside one document is content, not corpus duplication)
    * — the same minDocs discipline as [[removeSharedSpans]].
    */
  def maximalSharedSpans(docs: DataFrame, idCol: String, textCol: String,
      minTokens: Int = 10, minDocs: Int = 2): DataFrame = {
    require(minTokens >= 2, s"minTokens must be >= 2 (got $minTokens)")
    require(minDocs >= 2, s"minDocs must be >= 2 (got $minDocs): " +
      "every span occurs in its own document, so a lower bound reports everything")
    val k = minTokens
    val base = docs.select(col(idCol).as("id"), split(col(textCol), " ").as("t"))
    val grams = base.select(col("id"),
      posexplode(positionalGrams(col("t"), k)).as(Seq("i", "g")))
    val shared = grams.select(col("id"), col("g")).distinct()
      .groupBy(col("g")).agg(count(lit(1)).as("__ndocs"))
      .filter(col("__ndocs") >= minDocs).select(col("g"))
    val starts = grams.join(shared, Seq("g"))
      .groupBy(col("id")).agg(sort_array(collect_set(col("i"))).as("ss"))
    // run coalescing against shifted neighbors: heads have no shared start
    // at i−1, tails none at i+1; sorted order pairs them 1:1 per run
    val ss = col("ss")
    val prev = concat(array(lit(-2)), slice(ss, lit(1), size(ss) - 1))
    val next = concat(slice(ss, lit(2), size(ss) - 1), array(lit(-2)))
    val heads = filter(zip_with(ss, prev, (s, p) => when(p + 1 =!= s, s)), x => x.isNotNull)
    val tails = filter(zip_with(ss, next, (s, nx) => when(nx =!= s + 1, s)), x => x.isNotNull)
    starts
      .select(col("id"), explode(zip_with(heads, tails,
        (h, t) => struct(h.as("span_start"), (t - h + k).as("span_len")))).as("sp"))
      .select(col("id"), col("sp.span_start"), col("sp.span_len"))
  }

  /** All n-token windows of `t` as space-joined strings, position-aligned
    * (element i = gram starting at token i); empty for docs shorter than n. */
  private def positionalGrams(t: Column, n: Int): Column =
    when(size(t) >= n,
      transform(sequence(lit(0), size(t) - n),
        i => concat_ws(" ", slice(t, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Row-local window-union rebuild shared by the removal operators: drop
    * every token whose position falls inside any [start, start+n) window of
    * `startsDf` (id, __starts), re-join the survivors. */
  private def dropWindows(base: DataFrame, startsDf: DataFrame, n: Int): DataFrame =
    base.join(startsDf, Seq("id"), "left")
      .withColumn("__starts", coalesce(col("__starts"), array().cast("array<int>")))
      .withColumn("__kept",
        filter(zip_with(col("t"), sequence(lit(0), size(col("t")) - 1),
          (tok, p) => struct(tok.as("tok"), p.as("p"))),
          x => !exists(col("__starts"),
            s => s <= x.getField("p") && x.getField("p") < s + n)))
      .select(col("id"),
        size(col("t")).as("n_tokens"),
        (size(col("t")) - size(col("__kept"))).as("n_removed"),
        concat_ws(" ", transform(col("__kept"), x => x.getField("tok"))).as("text_clean"))

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
