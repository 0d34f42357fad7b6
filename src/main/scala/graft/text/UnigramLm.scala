package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer training step (Kudo 2018, the SentencePiece
  * unigram model) — the OTHER major subword family next to BPE
  * ([[BpeTrain]]): instead of greedy merges, a piece vocabulary with
  * probabilities, a Viterbi segmentation of every word under it, and an
  * EM count update. Beyond-reference.
  *
  * Axis discipline (the BPE rule): the corpus is scanned ONCE for the
  * word histogram; everything after — seed-piece counting, probability
  * assignment, Viterbi DP, expected-count M-step — runs on the
  * |vocab|-sized distinct-word axis, cost |vocab|·len·maxPieceLen, never
  * corpus-sized. Documents join segmentations back on the word key if
  * per-doc encoding is needed.
  *
  * Determinism (the cross-engine contract): piece log-probabilities are
  * pinned to SCALED INTEGERS — round(ln(cnt/total)·1e9) as BIGINT — so
  * the Viterbi DP is exact integer arithmetic in any engine; the
  * argmax rule is orderless (max score, ties to the SMALLEST span start,
  * i.e. the longest piece ending at the position), so no engine's
  * iteration order can flip a segmentation. The DP itself is row-local:
  * candidate spans join piece probs on the piece key (vocab-axis join),
  * collect per word, and a single `aggregate` expression fills dp[0..n]
  * and a second walks the backpointers — no UDF, no driver loop.
  */
object UnigramLm {

  /** Long.MinValue/2: "unreachable" DP score that survives adding a
    * log-prob without overflow.
    */
  private val NEG = Long.MinValue / 2

  /** One corpus scan: (word, freq) histogram. */
  def wordHistogram(docs: DataFrame, textCol: Column): DataFrame =
    docs.select(explode(split(textCol, " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Seed vocabulary: every substring of length 1..maxPieceLen of every
    * distinct word, counted with the word's corpus frequency (one count
    * per OCCURRENCE position — "aa" contributes "a" twice). Kept pieces =
    * the top `topV` by (count desc, piece asc) UNION all single
    * characters — singles make every word segmentable, the closure
    * property Viterbi needs.
    */
  def seedPieces(words: DataFrame, maxPieceLen: Int, topV: Int): DataFrame = {
    val subs = words
      .select(col("word"), col("freq"),
        explode(sequence(lit(0), length(col("word")) - 1)).as("j"))
      .select(col("word"), col("freq"), col("j"),
        explode(sequence(lit(1), lit(maxPieceLen))).as("l"))
      .filter(col("j") + col("l") <= length(col("word")))
      .select(expr("substring(word, j + 1, l)").as("piece"), col("freq"))
    val counts = subs.groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
    val top = counts.orderBy(col("cnt").desc, col("piece")).limit(topV)
    val singles = counts.filter(length(col("piece")) === 1)
    top.unionByName(singles).dropDuplicates("piece")
  }

  /** Scaled-integer log-probs over the kept pieces: round(ln(p)·1e9).
    * ln() may differ by an ulp across libms; at the 1e9 scale that is a
    * ~1e-6 perturbation on integers — the round absorbs it (same pinning
    * budget as the PageRank 9-dp discipline).
    */
  def pieceLogProbs(pieces: DataFrame): DataFrame = {
    val total = pieces.agg(sum(col("cnt")).as("total"))
    pieces.crossJoin(broadcast(total))
      .select(col("piece"),
        round(log(col("cnt").cast("double") / col("total").cast("double")) * 1e9, 0)
          .cast("long").as("lp"))
  }

  /** Viterbi-best segmentation of every distinct word under the piece
    * log-probs: (word, freq, seg '|'-joined, n_pieces, score_scaled).
    * dp[i] = best (score, spanStart) over spans ending at i; ties to the
    * smallest start. Both the fill and the backtrace are single
    * `aggregate` expressions over `sequence(1, n)` — row-local, codegen-
    * friendly, no per-position shuffle.
    */
  def viterbiSegment(words: DataFrame, logProbs: DataFrame, maxPieceLen: Int): DataFrame = {
    val spans = words
      .select(col("word"), col("freq"),
        explode(sequence(lit(0), length(col("word")) - 1)).as("j"))
      .select(col("word"), col("freq"), col("j"),
        explode(sequence(lit(1), lit(maxPieceLen))).as("l"))
      .filter(col("j") + col("l") <= length(col("word")))
      .withColumn("piece", expr("substring(word, j + 1, l)"))
      .join(logProbs, Seq("piece"))
      .select(col("word"), col("freq"),
        (col("j") + col("l")).as("i"), col("j"), col("lp"))
    val wspans = spans.groupBy(col("word"), col("freq"))
      .agg(sort_array(collect_list(struct(col("i"), col("j"), col("lp")))).as("spans"))
    val dpExpr =
      s"""aggregate(
         |  sequence(1, length(word)),
         |  array(named_struct('s', CAST(0 AS BIGINT), 'p', -1)),
         |  (acc, pos) -> concat(acc, array(
         |    aggregate(
         |      filter(spans, sp -> sp.i = pos),
         |      named_struct('s', CAST($NEG AS BIGINT), 'p', -1),
         |      (b, sp) -> IF(element_at(acc, sp.j + 1).s + sp.lp > b.s
         |                    OR (element_at(acc, sp.j + 1).s + sp.lp = b.s AND sp.j < b.p),
         |                 named_struct('s', element_at(acc, sp.j + 1).s + sp.lp, 'p', sp.j),
         |                 b)))))""".stripMargin
    val btExpr =
      s"""aggregate(
         |  sequence(1, length(word)),
         |  named_struct('pos', length(word), 'ps', CAST(array() AS array<string>)),
         |  (acc, x) -> IF(acc.pos > 0,
         |    named_struct(
         |      'pos', element_at(dp, acc.pos + 1).p,
         |      'ps', concat(
         |        array(substring(word, element_at(dp, acc.pos + 1).p + 1,
         |                        acc.pos - element_at(dp, acc.pos + 1).p)),
         |        acc.ps)),
         |    acc)).ps""".stripMargin
    wspans
      .withColumn("dp", expr(dpExpr))
      .withColumn("pieces", expr(btExpr))
      .select(col("word"), col("freq"),
        array_join(col("pieces"), "|").as("seg"),
        size(col("pieces")).as("n_pieces"),
        expr("element_at(dp, length(word) + 1).s").as("score_scaled"))
  }

  /** The M-step: expected piece counts under the Viterbi segmentation —
    * each word contributes freq per occurrence of the piece in its
    * segmentation. Still vocabulary-axis: explode segmentations, never
    * the corpus. (Viterbi-EM: hard-assignment counts; the next iteration
    * re-derives probs from these and re-segments.)
    */
  def expectedCounts(segments: DataFrame): DataFrame =
    segments
      .select(col("freq"), explode(split(col("seg"), "\\|")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("e_cnt"))

  /** One full EM training step from a corpus: histogram → seed → probs →
    * Viterbi → expected counts, everything after the first scan on the
    * vocabulary axis.
    */
  def emStep(docs: DataFrame, textCol: Column, maxPieceLen: Int, topV: Int)
      : (DataFrame, DataFrame) = {
    val words = wordHistogram(docs, textCol)
    val probs = pieceLogProbs(seedPieces(words, maxPieceLen, topV))
    val segs = viterbiSegment(words, probs, maxPieceLen)
    (segs, expectedCounts(segs))
  }

  /** Per-document subword encoding under trained segmentations — the BPE
    * `encodePerDoc` counterpart: the Viterbi DP ran once per DISTINCT
    * word, documents join the (word → piece count) frame on the word key,
    * so cost is corpus-join-vocab, never corpus·DP.
    */
  def encodePerDoc(docs: DataFrame, idCol: String, textCol: Column,
      segments: DataFrame): DataFrame =
    docs.select(col(idCol), explode(split(textCol, " ")).as("word"))
      .filter(length(col("word")) > 0)
      .join(segments.select(col("word"), col("n_pieces")), Seq("word"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("n_pieces")).as("n_subwords"))

  /** Viterbi-EM driver loop: re-estimate piece probabilities from the
    * previous round's hard counts and re-segment, `iters` times. Pieces
    * whose expected count drops to zero prune out; the single-character
    * closure set survives every round (floor count 1) so segmentation
    * stays total. Each round is the same bounded vocab-axis work as
    * [[emStep]] — the driver loop carries only DataFrame lineage, no
    * collected state.
    */
  def emSteps(docs: DataFrame, textCol: Column, maxPieceLen: Int, topV: Int,
      iters: Int): DataFrame = {
    require(iters >= 1, "need at least one EM iteration")
    val words = wordHistogram(docs, textCol)
    val seed = seedPieces(words, maxPieceLen, topV)
    val singles = seed.filter(length(col("piece")) === 1).select(col("piece"))
    var counts = seed
    var segs = viterbiSegment(words, pieceLogProbs(counts), maxPieceLen)
    var i = 1
    while (i < iters) {
      val e = expectedCounts(segs)
      counts = e.join(singles, Seq("piece"), "full")
        .select(col("piece"), coalesce(col("e_cnt"), lit(1L)).as("cnt"))
      segs = viterbiSegment(words, pieceLogProbs(counts), maxPieceLen)
      i += 1
    }
    segs
  }
}
