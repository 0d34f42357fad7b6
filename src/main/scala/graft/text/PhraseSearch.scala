package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact multi-word phrase search over a positional inverted index — the
  * retrieval primitive BM25's bag-of-words scoring cannot express ("find
  * every training document containing THIS benchmark sentence verbatim"),
  * and the standard way contamination triage confirms a hit after a
  * fuzzy screen flags it (Brown et al. 2020 report exact-substring checks
  * at this granularity; see also Manning et al. 2008, IIR §2.4 positional
  * postings).
  *
  * A document matches a phrase t₀…t_{m−1} at anchor position a when its
  * token at a+i equals tᵢ for every i. Each (posting, phrase-term) join row
  * votes for one anchor a = pos − i; an anchor with m votes is a match —
  * two decomposable counting aggregates, no self-join of the postings, no
  * window, no per-doc re-scan.
  *
  * Scale shape:
  *   - positional postings (doc_id, pos, term) come from ONE corpus scan
  *     (posexplode of the tokenized text) — the same single-scan discipline
  *     as [[Bm25]]'s postings;
  *   - the phrase side is the benchmark's (query_id, i, term) triples —
  *     fixed-size by definition — and BROADCASTS, so the Zipf-hot term key
  *     never becomes a shuffle key: the corpus streams past in one scan;
  *   - anchor votes group on (query, doc, anchor) — a fine-grained
  *     composite key that spreads hot docs across reducers by position and
  *     is map-side combined (≤ m rows per group);
  *   - everything is integers/strings: no float pinning anywhere.
  *
  * Output: one row per (query_id, doc_id) with ≥1 full-phrase match —
  * (query_id, doc_id, n_hits, first_pos), n_hits = number of distinct
  * anchor positions, first_pos = the smallest.
  */
object PhraseSearch {

  /** `queries`: (query_id, phrase) with whitespace-tokenized phrases;
    * phrases must be non-empty — an empty phrase would vacuously match
    * every position, so it raises loudly instead.
    */
  def search(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      queries: DataFrame,
      queryIdCol: String = "query_id",
      phraseCol: String = "phrase"): DataFrame = {
    val qt = queries.select(
      col(queryIdCol).as("query_id"), split(col(phraseCol), " ").as("qtoks"))
      .withColumn("qlen",
        when(size(col("qtoks")) === 0 ||
            (size(col("qtoks")) === 1 && element_at(col("qtoks"), 1) === ""),
          raise_error(concat(lit("PhraseSearch: empty phrase for query "),
            col("query_id").cast("string"))))
        .otherwise(size(col("qtoks"))))
      .select(col("query_id"), col("qlen"),
        posexplode(col("qtoks")).as(Seq("qi", "term")))

    val postings = corpus.select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "term")))

    val votes = postings.join(broadcast(qt), Seq("term"))
      .withColumn("anchor", col("pos") - col("qi"))
      .filter(col("anchor") >= 0)
    val anchors = votes
      .groupBy(col("query_id"), col("doc_id"), col("anchor"), col("qlen"))
      .agg(count(lit(1)).as("nv"))
      .filter(col("nv") === col("qlen"))
    anchors.groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_hits"), min(col("anchor")).as("first_pos"))
  }
}
