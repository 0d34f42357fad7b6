package graft.similarity

import graft.SparkTestBase

class RrfSpec extends SparkTestBase {
  import spark.implicits._

  // query 1: lists overlap on doc 10, disagree elsewhere
  private def lex = Seq(
    (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3)
  ).toDF("query_id", "doc_id", "rnk")
  private def dense = Seq(
    (1L, 10L, 2), (1L, 13L, 1)
  ).toDF("query_id", "doc_id", "rnk")

  test("hand-computed RRF scores: overlap sums, single-list coalesces to 0") {
    val out = Rrf.fuse(Seq("lex" -> lex, "dense" -> dense), kRrf = 60, topK = 10)
      .collect().map(r => r.getLong(1) ->
        ((Option(r.get(2)), Option(r.get(3)), r.getDouble(4), r.getInt(5)))).toMap
    val eps = 1e-9
    // doc 10 in both lists: 1/61 + 1/62
    assert(math.abs(out(10L)._3 - math.rint((1.0 / 61 + 1.0 / 62) * 1e6) / 1e6) < eps)
    assert(out(10L)._1.contains(1) && out(10L)._2.contains(2))
    // dense-only doc 13: 1/61, lex rank NULL
    assert(out(13L)._1.isEmpty && math.abs(out(13L)._3 - 0.016393) < 1e-6)
    // fused order: 10 (both lists) > 13 (rank-1 dense) > 11 > 12
    assert(Seq(10L, 13L, 11L, 12L).map(out(_)._4) == Seq(1, 2, 3, 4))
  }

  test("ties on fused score break to the smaller doc_id") {
    // two docs each rank-1 in exactly one list -> identical rrf
    val a = Seq((7L, 100L, 1)).toDF("query_id", "doc_id", "rnk")
    val b = Seq((7L, 50L, 1)).toDF("query_id", "doc_id", "rnk")
    val out = Rrf.fuse(Seq("a" -> a, "b" -> b), topK = 10)
      .collect().map(r => r.getLong(1) -> r.getInt(5)).toMap
    assert(out(50L) == 1 && out(100L) == 2)
  }

  test("single-list fusion preserves the list's own order and topK truncates") {
    val one = (1 to 20).map(i => (3L, i.toLong, i)).toDF("query_id", "doc_id", "rnk")
    val out = Rrf.fuse(Seq("only" -> one), topK = 5).collect()
      .map(r => (r.getLong(1), r.getInt(4))).sortBy(_._2)
    assert(out.map(_._1).toSeq == (1L to 5L), s"got ${out.toSeq}")
  }

  test("queries present in only one channel still rank") {
    val out = Rrf.fuse(Seq(
      "lex" -> Seq((9L, 1L, 1)).toDF("query_id", "doc_id", "rnk"),
      "dense" -> dense), topK = 10)
      .collect().map(r => r.getLong(0)).distinct.sorted
    assert(out.toSeq == Seq(1L, 9L))
  }
}
