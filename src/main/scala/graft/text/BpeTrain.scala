package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE vocabulary training primitives (beyond-reference
  * training-data op; Sennrich et al. 2016). The expensive part of training
  * a subword vocabulary on a 100 TB corpus is NOT the merge loop — it is
  * reducing the corpus to a word histogram. That is how this is shaped:
  *
  * ONE corpus-sized aggregate builds (word, count) — map-side combined on
  * the well-spread word axis — and every subsequent step (pair counting,
  * best-pair selection, merge application) runs on the VOCABULARY axis,
  * which is bounded and ≪ corpus. Per merge iteration exactly one row (the
  * winning pair) reaches the driver; the merge itself is a row-local
  * left-to-right fold over each word's symbol array. Top-k reporting is
  * TakeOrderedAndProject, never a global sort.
  *
  * Ties break deterministically: highest count, then lexicographically
  * smallest pair — so training is reproducible run to run.
  */
object BpeTrain {

  /** The vocabulary workspace: (w, cnt, cs) — distinct corpus words with
    * counts and their current symbol arrays (initially one char per symbol).
    * Words shorter than 2 chars carry no pairs and are dropped.
    */
  def wordSymbols(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .withColumn("cs", split(col("w"), ""))
      .filter(size(col("cs")) >= 2)

  /** Adjacent-symbol pair counts weighted by word frequency:
    * (pair, cnt) with pair = "sym1 sym2".
    */
  def pairCounts(sym: DataFrame): DataFrame =
    sym.select(col("cnt"), explode(
        transform(sequence(lit(0), size(col("cs")) - 2),
          i => concat_ws(" ", element_at(col("cs"), i + 1),
            element_at(col("cs"), i + 2)))).as("pair"))
      .groupBy(col("pair")).agg(sum(col("cnt")).as("cnt"))

  /** The classic left-to-right non-overlapping merge of (p1, p2) → p1+p2,
    * applied row-locally to each symbol array: fold each next symbol onto
    * the accumulator, replacing its last element when (last, next) is the
    * winning pair. "a a a" under pair (a, a) becomes ["aa", "a"], not
    * ["aa", "aa"-overlap] — the merged symbol no longer equals p1, which is
    * exactly the non-overlap rule.
    */
  def applyMerge(cs: Column, p1: String, p2: String): Column = {
    val merged = p1 + p2
    aggregate(
      slice(cs, lit(2), size(cs) - 1),
      array(element_at(cs, 1)),
      (acc, x) => when(element_at(acc, -1) === p1 && x === p2,
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
        .otherwise(concat(acc, array(x))))
  }

  /** Learn `n` merges: the driver loop of BPE training. Each iteration is
    * one vocabulary-axis job collecting exactly one row. Returns the merge
    * pairs in order ("sym1 sym2"). Stops early if no pair remains.
    */
  def learnMerges(docs: DataFrame, textCol: String, n: Int): Seq[String] = {
    var sym = wordSymbols(docs, textCol).cache()
    val out = Seq.newBuilder[String]
    var i = 0
    var done = false
    while (i < n && !done) {
      val top = pairCounts(sym)
        .orderBy(col("cnt").desc, col("pair")).limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val pair = top.head.getString(0)
        val Array(p1, p2) = pair.split(" ", 2)
        out += pair
        val next = sym.withColumn("cs", applyMerge(col("cs"), p1, p2)).cache()
        next.count() // materialize before unpersisting the parent
        sym.unpersist()
        sym = next
      }
      i += 1
    }
    sym.unpersist()
    out.result()
  }

  /** Encode the corpus under an ordered merge list: per-document token and
    * post-merge symbol counts — the "how much does this vocabulary compress
    * my corpus" signal tokenizer training iterates on.
    *
    * Scale shape: the merge folds run ONCE per distinct word on the
    * vocabulary axis (all words this time — single-char words count one
    * symbol); documents then join back on the well-spread word key and the
    * per-doc aggregate map-side combines. Encoding cost is proportional to
    * |vocab|·|merges|, never corpus·|merges|.
    *
    * Output: (id, n_tokens, n_symbols) per document.
    */
  def encodePerDoc(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[String]): DataFrame = {
    val enc = merges.foldLeft(col("cs")) { (c, m) =>
      val Array(p1, p2) = m.split(" ", 2)
      applyMerge(c, p1, p2)
    }
    val nsym = docs.select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .distinct()
      .withColumn("cs", split(col("w"), ""))
      .select(col("w"), size(enc).as("n_sym"))
    docs.select(col(idCol).as("id"), explode(TextFunctions.tokens(col(textCol))).as("w"))
      .join(nsym, Seq("w"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("n_sym")).as("n_symbols"))
  }

  /** One full train step as a single reportable frame (the gate shape):
    * learn the best pair, apply it, return the top-k pair counts of the
    * RESULTING vocabulary — (pair, cnt), count-desc / pair-asc.
    */
  def mergeStepTopPairs(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    val sym = wordSymbols(docs, textCol)
    val top = pairCounts(sym)
      .orderBy(col("cnt").desc, col("pair")).limit(1).collect()
    require(top.nonEmpty, "corpus has no adjacent symbol pairs")
    val Array(p1, p2) = top.head.getString(0).split(" ", 2)
    pairCounts(sym.withColumn("cs", applyMerge(col("cs"), p1, p2)))
      .orderBy(col("cnt").desc, col("pair")).limit(k)
  }
}
