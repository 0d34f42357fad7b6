package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines —
  * beyond-reference operators (builder prompt; SURVEY §7.1 step 7). All are
  * pure `functions._` compositions: codegen-friendly, no UDFs, fully
  * pushdown/prune-compatible, and each has an exact DuckDB-SQL equivalent
  * for the oracle gate.
  */
object TextFunctions {

  /** Whitespace tokenizer (the documents table is space-separated). */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  def distinctTokenCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** All word n-grams IN ORDER OF OCCURRENCE (duplicates preserved — the
    * repetition signals need counts; [[graft.dedup.Dedup.shingles]] is the
    * distinct-set variant for Jaccard). Empty array below n tokens.
    */
  def ngrams(text: Column, n: Int): Column = {
    val t = tokens(text)
    when(size(t) >= n,
      transform(sequence(lit(0), size(t) - n),
        i => concat_ws(" ", slice(t, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Mean token length in characters. */
  def avgTokenLen(text: Column): Column = {
    val t = tokens(text)
    aggregate(t, lit(0L), (acc, x) => acc + length(x)).cast("double") / size(t)
  }

  /** Fraction of tokens found in `stopwords`. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val t = tokens(text)
    size(filter(t, x => x.isin(stopwords.map(lit): _*))).cast("double") / size(t)
  }

  /** Type-token ratio — lexical-diversity quality signal. */
  def typeTokenRatio(text: Column): Column =
    distinctTokenCount(text).cast("double") / tokenCount(text)

  /** Composite quality score in [0,1]: length band + lexical diversity −
    * stopword saturation. Deterministic, SQL-replicable.
    */
  def qualityScore(text: Column, stopwords: Seq[String] = Seq("the", "a")): Column = {
    val lenScore = least(tokenCount(text).cast("double") / 100.0, lit(1.0))
    val diversity = typeTokenRatio(text)
    val stopPenalty = stopwordRatio(text, stopwords)
    greatest(least((lenScore + diversity - stopPenalty) / 2.0, lit(1.0)), lit(0.0))
  }

  /** Per-language marker-token sets for the n-gram/marker language-ID
    * heuristic. Tiny closed-class word lists; the scoring is what matters
    * (count of marker hits per language, argmax, alphabetical tie-break).
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "nicht"),
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "fr" -> Seq("le", "la", "les", "et", "des"),
    "zh" -> Seq("de", "shi", "le", "bu", "wo"))

  /** Predicted language = argmax over marker-hit counts, ties broken by
    * language code ascending (deterministic).
    */
  def langId(text: Column): Column = {
    val t = tokens(text)
    def score(markers: Seq[String]): Column =
      size(filter(t, x => x.isin(markers.map(lit): _*)))
    // argmax with alphabetical tie-break: fold over languages in order,
    // keep strict-greater replacement
    val first = langMarkers.head
    val init = struct(score(first._2).as("s"), lit(first._1).as("l"))
    val best = langMarkers.tail.foldLeft(init) { case (acc, (lang, markers)) =>
      val s = score(markers)
      struct(
        when(s > acc.getField("s"), s).otherwise(acc.getField("s")).as("s"),
        when(s > acc.getField("s"), lit(lang)).otherwise(acc.getField("l")).as("l"))
    }
    best.getField("l")
  }

  /** Exact content fingerprint. */
  def fingerprint(text: Column): Column = md5(text)

  /** Order-insensitive bag fingerprint: md5 of the sorted distinct token
    * set — detects shuffled/reordered duplicates.
    */
  def bagFingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** 60-bit numeric hash of a string via md5 prefix — the cross-engine
    * numeric hash shared with the DuckDB oracle
    * (`CAST('0x'||substr(md5(s),1,15) AS UBIGINT)`).
    */
  def hash60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** BPE-ish regex tokenization: letter runs, digit runs, and single
    * non-alphanumeric symbols — the pre-tokenization pattern BPE vocabs
    * split on. Same pattern semantics in Java regex (Spark) and RE2
    * (DuckDB oracle).
    */
  val BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(BPE_PATTERN), lit(0))

  def bpeTokenCount(text: Column): Column = size(bpeTokens(text))

  /** Fraction of non-space characters that are punctuation/symbols. */
  def punctRatio(text: Column): Column = {
    val nonSpace = length(regexp_replace(text, " ", ""))
    val punct = length(regexp_replace(text, "[A-Za-z0-9 ]", ""))
    when(nonSpace === 0, 0.0).otherwise(punct.cast("double") / nonSpace)
  }

  val ROLL_P: Long = 2147483647L
  val ROLL_B: Long = 31L

  /** Precomputed B^pos mod p for positions 0..maxPos — shared verbatim with
    * the SQL oracle so both engines do identical modular arithmetic.
    */
  def rollPowers(maxPos: Int): IndexedSeq[Long] = {
    val out = new Array[Long](maxPos + 1)
    out(0) = 1L
    var i = 1
    while (i <= maxPos) { out(i) = out(i - 1) * ROLL_B % ROLL_P; i += 1 }
    out.toIndexedSeq
  }

  /** Position-weighted polynomial rolling hash of a document's token
    * stream: fp = Σ_pos H(token_pos)·B^pos mod p. Order-SENSITIVE (unlike
    * [[bagFingerprint]]) — reordered duplicates hash differently, shifted
    * content shifts every term. Computed distributed: posexplode tokens,
    * broadcast-join the tiny powers table, sum-aggregate.
    */
  def rollingFingerprint(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      maxPos: Int = 1024): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val powers = rollPowers(maxPos).zipWithIndex.map { case (bp, pos) => (pos, bp) }.toDF("pos", "bp")
    df.select(col(idCol).as("id"), posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
      .withColumn("h", pmod(hash60(col("tok")), lit(ROLL_P)))
      .join(broadcast(powers), "pos")
      .groupBy(col("id"))
      .agg(pmod(sum(col("h") * col("bp") % ROLL_P), lit(ROLL_P)).as("fingerprint"))
  }
}
