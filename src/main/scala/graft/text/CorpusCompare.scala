package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-to-corpus distribution comparison — the mixture-monitoring side
  * of curation. Two operators, both beyond-reference:
  *
  *   - per-source unigram KL divergence KL(P_source ‖ P_corpus): the
  *     "how far has this source drifted from the mixture" scalar that
  *     release dashboards track per snapshot (support(P_s) ⊆ support(P)
  *     by construction, so the sum is always finite);
  *   - Dunning log-likelihood (G²) keyness (Dunning 1993, "Accurate
  *     methods for the statistics of surprise and coincidence"): the
  *     standard "which words characterize this source vs the rest"
  *     ranking, more robust than PMI/TF-IDF at low counts.
  *
  * Plan shape: ONE explode of the corpus to (source, word) counts; the
  * word-axis corpus counts derive from that frame by a second (vocab-
  * sized) aggregate, never a second corpus scan. Everything after the
  * first aggregate runs on the bounded (source × vocab) axis. Hot-word
  * skew lives in the FIRST groupBy only, where partial aggregation
  * absorbs it (map-side combine on (source, word)).
  *
  * Determinism discipline (PMI-gate precedent): each per-word float term
  * pins to a DECIMAL before the order-free exact sum; logs appear in one
  * fixed left-to-right expanded form; a single IEEE division chain per
  * output value, mirrored verbatim by the oracle.
  */
object CorpusCompare {

  /** (source, word, c) counts with derived totals joined on:
    * c = count in source, cw = corpus count of word, ts = source tokens,
    * t = corpus tokens.
    */
  private def countsFrame(docs: DataFrame, sourceCol: Column, textCol: Column): DataFrame = {
    val csw = docs.select(sourceCol.as("source"), explode(split(textCol, " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("source", "word").agg(count(lit(1)).as("c"))
    val cw = csw.groupBy("word").agg(sum("c").as("cw"))
    val ts = csw.groupBy("source").agg(sum("c").as("ts"))
    val t = csw.agg(sum("c").as("t"))
    csw.join(cw, Seq("word"))
      .join(broadcast(ts), Seq("source"))
      .crossJoin(broadcast(t))
  }

  /** Per-source KL(P_s ‖ P_corpus) in nats, plus the vocab/token axes.
    * Per-word term: (c/ts) · (ln c − ln ts − ln cw + ln t), pinned at 9 dp
    * before the exact decimal sum; output at 6 dp.
    */
  def sourceKl(docs: DataFrame, sourceCol: Column, textCol: Column): DataFrame = {
    val base = countsFrame(docs, sourceCol, textCol)
    val term = round(
      (col("c").cast("double") / col("ts")) *
        (log(col("c").cast("double")) - log(col("ts").cast("double")) -
          log(col("cw").cast("double")) + log(col("t").cast("double"))), 9)
      .cast("decimal(24,9)")
    base.select(col("source"), col("ts"), term.as("term"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_words"), max(col("ts")).as("n_tokens"),
        round(sum(col("term")).cast("double"), 6).as("kl"))
      .orderBy("source")
  }

  /** Top-k overrepresented words per source by G² keyness against the
    * rest of the corpus. Contingency per (source, word):
    *   a = c(word, source), b = c(word, rest),
    *   c2 = tokens(source) − a, d = tokens(rest) − b;
    * G² = 2·Σ_cell o·(ln o − ln rowTot − ln colTot + ln t), zero cells
    * contributing zero. Only overrepresented rows (a·t > (a+b)·ts) rank.
    * The rank window runs over the bounded (source × vocab) aggregate —
    * never the corpus axis.
    */
  def keynessG2(docs: DataFrame, sourceCol: Column, textCol: Column, topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = countsFrame(docs, sourceCol, textCol)
      .select(col("source"), col("word"),
        col("c").as("a"), (col("cw") - col("c")).as("b"),
        (col("ts") - col("c")).as("c2"),
        (col("t") - col("ts") - (col("cw") - col("c"))).as("d"),
        col("ts"), col("cw"), col("t"))
    def cell(o: Column, row: Column, colTot: Column, t: Column): Column =
      when(o > 0, round(o.cast("double") *
        (log(o.cast("double")) - log(row.cast("double")) -
          log(colTot.cast("double")) + log(t.cast("double"))), 9))
        .otherwise(lit(0.0)).cast("decimal(24,9)")
    val scored = base.select(col("source"), col("word"), col("a"), col("b"),
      (cell(col("a"), col("cw"), col("ts"), col("t")) +
        cell(col("b"), col("cw"), col("t") - col("ts"), col("t")) +
        cell(col("c2"), col("t") - col("cw"), col("ts"), col("t")) +
        cell(col("d"), col("t") - col("cw"), col("t") - col("ts"), col("t"))).as("g2h"),
      // decimal cross-products: long·long would overflow past ~3·10⁹ tokens
      (col("a").cast("decimal(19,0)") * col("t").cast("decimal(19,0)") >
        col("cw").cast("decimal(19,0)") * col("ts").cast("decimal(19,0)")).as("over"))
    val ranked = scored.filter(col("over"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("g2h").desc, col("word"))))
      .filter(col("rn") <= topK)
    ranked.select(col("source"), col("word"), col("a").as("n_in_source"),
      col("b").as("n_in_rest"),
      round((col("g2h") * lit(2)).cast("double"), 6).as("g2"),
      col("rn").as("rank"))
      .orderBy("source", "rank")
  }
}
