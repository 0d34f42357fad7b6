package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009, "Reciprocal
  * Rank Fusion outperforms Condorcet and individual Rank Learning
  * Methods") — the standard way to combine a lexical retriever (BM25,
  * [[graft.text.Bm25]]) with a dense one (cosine ANN, [[Similarity]])
  * into one hybrid ranking:
  *
  *     rrf(q, d) = Σ_{lists L where d ∈ L(q)}  1 / (kRrf + rank_L(q, d))
  *
  * A document missing from a list simply contributes nothing (that
  * robustness to non-overlapping candidate sets is RRF's whole point —
  * no score normalization across incomparable scales is needed).
  * kRrf = 60 is the constant from the original paper.
  *
  * Scale shape: the inputs are already-ranked top-k lists, so every frame
  * here is |queries| · k rows — bounded by construction, never
  * corpus-sized. The fusion is one groupBy on (query_id, doc_id) over the
  * union of the tagged lists (a tiny shuffle), the RRF sum is a row-local
  * fixed-order expression over the pivoted per-list rank columns (each
  * term is 1/(kRrf + int) of an exact integer — bit-identical in any
  * engine, and the written term order makes the sum reproducible), and
  * the fused top-k goes through the salted two-stage
  * [[Similarity.topKPerQuery]] like every other retrieval head.
  */
object Rrf {

  /** Fuse named ranked lists, each a frame with (query_id, doc_id, rnk)
    * where rnk is the list's own 1-based rank. Returns one row per fused
    * candidate that survives the fused top-k:
    * (query_id, doc_id, rnk_<tag>... one per input list with NULL for
    * lists that missed the pair, rrf rounded to 6 dp, rnk).
    * Fused ties break deterministically on (rrf desc, doc_id asc).
    */
  def fuse(lists: Seq[(String, DataFrame)], kRrf: Int = 60,
      topK: Int = 10): DataFrame = {
    require(lists.nonEmpty, "at least one ranked list to fuse")
    require(kRrf > 0, s"kRrf must be positive: $kRrf")
    val tagged = lists.map { case (tag, df) =>
      df.select(col("query_id"), col("doc_id"), col("rnk"),
        lit(tag).as("src"))
    }
    val aggs = lists.map { case (tag, _) =>
      max(when(col("src") === tag, col("rnk"))).as(s"rnk_$tag")
    }
    val pivoted = tagged.reduce(_ unionByName _)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(aggs.head, aggs.tail: _*)
    // fixed written order of terms — the only FP additions here chain over
    // the (short, static) list axis, so the sum is engine-reproducible
    val rrfExpr = lists.map { case (tag, _) =>
      coalesce(lit(1.0) / (lit(kRrf) + col(s"rnk_$tag")), lit(0.0))
    }.reduce(_ + _)
    Similarity.topKPerQuery(
        pivoted.withColumn("rrf", round(rrfExpr, 6))
          .withColumnRenamed("doc_id", "neighbor_id"),
        "rrf", topK)
      .withColumnRenamed("neighbor_id", "doc_id")
      .select(col("query_id") +: col("doc_id") +:
        lists.map { case (tag, _) => col(s"rnk_$tag") } :+
        col("rrf") :+ col("rnk"): _*)
  }
}
