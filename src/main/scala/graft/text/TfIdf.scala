package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF top terms per document (beyond-reference training-data op): the
  * classic salient-term extraction used for topic tagging, keyword-based
  * filtering, and cheap retrieval indexes over a corpus.
  *
  * Definitions follow sklearn's smoothed idf:
  *     idf(t) = ln((1 + N) / (1 + df(t))) + 1,   tfidf = tf · idf,
  * with raw term counts as tf. All inputs to `ln` are exact integer ratios,
  * so the SQL oracle replays the doubles bit-for-bit.
  *
  * Scale: tf is a (doc, term) aggregate (map-side combined, keys well
  * spread); df is a distinct-doc count on the term axis (vocabulary-
  * bounded); N is one scalar. The per-doc top-k rank windows over a single
  * document's distinct terms — bounded by doc length, never corpus-sized —
  * with a deterministic (score desc, term asc) tie-break.
  */
object TfIdf {

  /** Top-k terms of each document by smoothed tf-idf.
    * Output: (id, term, tf, tfidf, rnk).
    */
  def topTerms(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int): DataFrame = {
    val terms = df.select(col(idCol).as("id"),
      explode(split(col(textCol), " ")).as("term"))
    val tf = terms.groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfT = terms.groupBy(col("term")).agg(countDistinct(col("id")).as("df"))
    val n = df.agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("id")).orderBy(col("tfidf").desc, col("term"))
    tf.join(dfT, Seq("term"))
      .crossJoin(n) // one scalar row
      .withColumn("tfidf",
        col("tf") * (log((lit(1) + col("n")).cast("double") / (lit(1) + col("df"))) + 1))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("id"), col("term"), col("tf"), col("tfidf"), col("rnk"))
  }
}
