package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece-style greedy longest-match-first subword encoding (Wu et al.
  * 2016; the BERT tokenizer family) — completing the trained-tokenizer
  * triad next to BPE merges ([[BpeTrain]]) and the Viterbi-optimal
  * unigram LM ([[UnigramLm]]). Greedy-vs-Viterbi is a real semantic
  * difference (greedy commits to the longest prefix even when a shorter
  * one yields fewer total pieces) and the specs pin it.
  *
  * Axis discipline: everything runs on the DISTINCT-WORD axis (the
  * [[BpeTrain.encodePerDoc]] rule) — the corpus contributes one scan for
  * the word histogram; encoding work is |vocabulary|-sized, not
  * corpus-sized, so 100 TB costs the same segmentation compute as 100 GB.
  *
  * Match lengths are precomputed as a table — longest vocab piece starting
  * at each (word, position), one bounded explode (|word|·maxPieceLen rows)
  * joined against the broadcast vocab, max per position — and the greedy
  * walk itself is a row-local `aggregate` fold over positions (pure
  * codegen, no UDF): position j advances the cursor only when j equals the
  * cursor, consuming mlen(j) characters (or 1 as `[UNK]` when no piece
  * matches there).
  *
  * Divergence from the BERT implementation, documented: no `##`
  * continuation-prefix vocabulary (pieces match uniformly at any
  * position), and an unmatchable POSITION emits `[UNK]` and advances one
  * character rather than UNK-ing the whole word.
  */
object WordPiece {

  val UNK = "[UNK]"

  /** Longest vocab match per (word, start): one explode of |word|·maxLen
    * candidate substrings, broadcast-joined to the vocab, max(l) per
    * position. Positions with no match are simply absent.
    */
  def matchLengths(words: DataFrame, vocab: DataFrame, maxPieceLen: Int): DataFrame =
    words
      .select(col("word"),
        explode(sequence(lit(0), length(col("word")) - 1)).as("j"))
      .select(col("word"), col("j"),
        explode(sequence(lit(1), lit(maxPieceLen))).as("l"))
      .filter(col("j") + col("l") <= length(col("word")))
      .select(col("word"), col("j"), col("l"),
        expr("substring(word, j + 1, l)").as("piece"))
      .join(broadcast(vocab.select("piece")), Seq("piece"))
      .groupBy("word", "j").agg(max("l").as("ml"))

  /** Greedy segmentation of every distinct word: (word, freq, pieces). */
  def greedySegment(words: DataFrame, vocab: DataFrame, maxPieceLen: Int): DataFrame = {
    val ml = matchLengths(words, vocab, maxPieceLen)
      .groupBy("word")
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("j"), col("ml"))))).as("mlMap"))
    val word = col("word")
    words.join(ml, Seq("word"), "left")
      .withColumn("seg",
        aggregate(
          sequence(lit(0), length(word) - 1),
          struct(lit(0).as("pos"), array().cast("array<string>").as("ps")),
          (st, j) => {
            val pos = st.getField("pos")
            // -1 encodes "no piece starts here" (incl. a word with no
            // matches at all, where the left join left mlMap null)
            val mlj = coalesce(element_at(col("mlMap"), j), lit(-1))
            val take = when(mlj > 0, mlj).otherwise(lit(1))
            val piece = when(mlj > 0,
                call_function("substring", word, pos + 1, mlj))
              .otherwise(lit(UNK))
            when(j === pos,
              struct((pos + take).as("pos"),
                concat(st.getField("ps"), array(piece)).as("ps")))
              .otherwise(st)
          }))
      .select(word, col("freq"), col("seg.ps").as("pieces"))
  }

  /** Corpus piece-usage card: for each emitted piece, the number of
    * distinct words using it and total corpus occurrences (word frequency ×
    * uses within the word); top `k` by usage. The explode is
    * vocabulary-axis-sized.
    */
  def usageStats(segmented: DataFrame, k: Int): DataFrame =
    segmented
      .select(col("word"), col("freq"), explode(col("pieces")).as("piece"))
      .groupBy("piece")
      .agg(countDistinct("word").as("n_words"), sum("freq").as("uses"))
      .orderBy(col("uses").desc, col("piece"))
      .limit(k)
}
