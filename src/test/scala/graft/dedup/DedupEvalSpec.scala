package graft.dedup

import graft.SparkTestBase

class DedupEvalSpec extends SparkTestBase {
  import spark.implicits._

  private def pin(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def pairs(ps: (Long, Long)*) = ps.toDF("id_a", "id_b")

  test("precision/recall/f1 from a hand ledger") {
    // truth = 4 pairs; candidates = 3, of which 2 are true
    val out = DedupEval.pairSetEval(
      pairs((1L, 2L), (3L, 4L), (9L, 10L)),
      pairs((1L, 2L), (3L, 4L), (5L, 6L), (7L, 8L))).collect().head
    val (p, r) = (2.0 / 3, 2.0 / 4)
    assert((out.getLong(0), out.getLong(1), out.getLong(2)) == ((4L, 3L, 2L)))
    assert(out.getDouble(3) == pin(p))
    assert(out.getDouble(4) == pin(r))
    assert(out.getDouble(5) == pin(2 * p * r / (p + r)))
  }

  test("duplicate candidate rows count once") {
    val out = DedupEval.pairSetEval(
      pairs((1L, 2L), (1L, 2L)), pairs((1L, 2L))).collect().head
    assert((out.getLong(1), out.getDouble(3), out.getDouble(4)) == ((1L, 1.0, 1.0)))
  }

  test("empty candidate set: precision 0, recall 0, f1 0 — no NaN") {
    val out = DedupEval.pairSetEval(
      pairs(), pairs((1L, 2L))).collect().head
    assert((out.getLong(1), out.getDouble(3), out.getDouble(4), out.getDouble(5))
      == ((0L, 0.0, 0.0, 0.0)))
  }

  test("the capped-LSH head vs the prefix-join truth composes end to end") {
    val docs = Seq(
      (0L, "alpha beta gamma delta"),
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "one two three four five"),
      (4L, "completely different text here now")
    ).toDF("doc_id", "text")
    val cand = Dedup.minhashLshPairs(docs, "doc_id", "text", 1, 16, 4, 0.8,
      maxBucketSize = Some(250))
    val truth = PrefixJoin.jaccardPrefixJoin(docs, "doc_id", "text", 1, 0.8)
    val out = DedupEval.pairSetEval(cand, truth).collect().head
    // truth: (0,1) J=1 and (0,2)/(1,2) J=0.8 — recall must be reported
    // against exactly those three
    assert(out.getLong(0) == 3L)
    assert(out.getDouble(4) <= 1.0 && out.getDouble(4) >= 0.0)
    assert(out.getLong(2) <= out.getLong(1) && out.getLong(2) <= out.getLong(0))
  }
}
