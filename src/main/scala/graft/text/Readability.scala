package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Flesch reading-ease / Flesch–Kincaid grade readability signals (Kincaid
  * et al. 1975 — public formulas) — the classic document-quality axis next
  * to the C4 heuristics and LM perplexity: flags both keyword-stuffing
  * (absurdly high grade) and trivial boilerplate (very low).
  *
  * Everything is row-local codegen over the shared Java∩RE2 regex subset
  * (the [[Pii]] rule): no shuffle, no UDF, and a SQL oracle replays every
  * count. Scores are plain IEEE ratio arithmetic (multiply/divide only — no
  * transcendentals), so 6-dp-pinned outputs are engine-identical by
  * construction.
  *
  * Counting conventions (pinned by spec + oracle):
  *   - words: whitespace tokens (the corpus-wide `tokens` convention);
  *   - sentences: runs of `[.!?]+` count as one terminator each; a document
  *     with no terminator is one sentence (max 1);
  *   - syllables: per word, vowel-group runs `[aeiouy]+` of the lowercased
  *     word, floored at 1 (consonant-only words still syllabify).
  */
object Readability {

  private val SENT = "[.!?]+"
  private val VOWELS = "[aeiouy]+"

  def wordCount(text: Column): Column = size(split(text, " "))

  def sentenceCount(text: Column): Column =
    greatest(size(regexp_extract_all(text, lit(SENT), lit(0))), lit(1))

  /** Σ over words of max(#vowel-group runs, 1). */
  def syllableCount(text: Column): Column =
    aggregate(
      transform(split(lower(text), " "),
        w => greatest(size(regexp_extract_all(w, lit(VOWELS), lit(0))), lit(1))),
      lit(0), (acc, x) => acc + x)

  /** 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words). */
  def fleschReadingEase(words: Column, sentences: Column, syllables: Column): Column =
    lit(206.835) -
      lit(1.015) * (words.cast("double") / sentences.cast("double")) -
      lit(84.6) * (syllables.cast("double") / words.cast("double"))

  /** 0.39·(words/sentences) + 11.8·(syllables/words) − 15.59. */
  def fkGrade(words: Column, sentences: Column, syllables: Column): Column =
    lit(0.39) * (words.cast("double") / sentences.cast("double")) +
      lit(11.8) * (syllables.cast("double") / words.cast("double")) -
      lit(15.59)
}
