package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PMI collocation mining (Church & Hanks 1990) — the phrase-discovery
  * step tokenizer/glossary pipelines run before freezing multi-word
  * units: adjacent pairs that co-occur far above chance under the
  * unigram model,
  *
  *   PMI(w1, w2) = ln P(w1,w2) − ln P(w1) − ln P(w2)
  *               = ln c12 − ln B − ln c1 − ln c2 + ln T + ln T
  *
  * with c12 over the adjacent-bigram axis (total B) and c1/c2 over the
  * unigram axis (total T). The log form is NOT a style choice: the ratio
  * form's numerator c12·T² passes 2⁵³ at corpus scale and silently loses
  * integer exactness in a double; the expanded sum keeps every operand an
  * exactly-representable count with one ln each, evaluated in a FIXED
  * left-to-right order both engines share.
  *
  * A minimum pair count screens the PMI pathology (hapax pairs of hapax
  * words score the maximum). Scale shape: two vocabulary-axis aggregates
  * from one token scan each, two scalar totals broadcast, the unigram
  * join keyed on the gram axis, and a TakeOrdered top-k — nothing sorts
  * the corpus.
  *
  * Output: top-k (w1, w2, n_pair, pmi) by (pmi desc, w1, w2), 6 dp.
  */
object Pmi {

  def collocations(
      df: DataFrame,
      textCol: Column,
      minCount: Long,
      k: Int): DataFrame = {
    require(minCount >= 1, s"minCount >= 1: $minCount")
    val bg = df.select(explode(LmScore.bigrams(textCol)).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val bc = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val uni = df.select(explode(split(textCol, " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val totals = bc.agg(sum(col("c12")).as("b_total"))
      .crossJoin(uni.agg(sum(col("c")).as("t_total")))
    val pmi =
      log(col("c12")) - log(col("b_total")) - log(col("c1")) -
        log(col("c2")) + log(col("t_total")) + log(col("t_total"))
    bc.filter(col("c12") >= minCount)
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), Seq("w2"))
      .crossJoin(totals) // one scalar row
      .select(col("w1"), col("w2"), col("c12").as("n_pair"),
        round(pmi, 6).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Stopword discovery: words whose document frequency exceeds
    * `dfFrac` of the corpus — how per-language stopword lists are
    * actually built before TF-IDF/BM25 runs. One distinct (doc, word)
    * axis aggregate; the doc total is a broadcast scalar.
    * Output: (word, df, df_frac, is_stop) for every word, 6 dp.
    */
  def stopwordDiscovery(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      dfFrac: Double): DataFrame = {
    val wordDf = df.select(idCol.as("id"), explode(split(textCol, " ")).as("w"))
      .filter(length(col("w")) > 0)
      .distinct()
      .groupBy(col("w").as("word")).agg(count(lit(1)).as("df"))
    val n = df.select(idCol.as("id")).distinct().agg(count(lit(1)).as("n_docs"))
    wordDf.crossJoin(n) // one scalar row
      .select(col("word"), col("df"),
        round(col("df").cast("double") / col("n_docs"), 6).as("df_frac"),
        (col("df").cast("double") / col("n_docs") >= dfFrac).as("is_stop"))
  }
}
