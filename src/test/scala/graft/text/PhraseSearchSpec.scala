package graft.text

import graft.SparkTestBase

class PhraseSearchSpec extends SparkTestBase {
  private lazy val sp = spark
  import sp.implicits._

  private def run(corpus: Seq[(Long, String)], queries: Seq[(Long, String)]) =
    PhraseSearch.search(
        corpus.toDF("doc_id", "text"), "doc_id", "text",
        queries.toDF("query_id", "phrase"))
      .as[(Long, Long, Long, Int)].collect()
      .map { case (q, d, n, p) => (q, d) -> (n, p) }.toMap

  test("matches anchors in order; bag-of-words presence is not enough") {
    val corpus = Seq(
      1L -> "the quick brown fox jumps",   // phrase at anchor 1
      2L -> "brown quick the fox",          // all terms, wrong order
      3L -> "x quick brown y quick brown z" // two anchors: 1 and 4
    )
    val got = run(corpus, Seq(10L -> "quick brown"))
    assert(got == Map(
      (10L, 1L) -> (1L, 1),
      (10L, 3L) -> (2L, 1)))
  }

  test("overlapping self-anchors all count") {
    val got = run(Seq(1L -> "a a a a"), Seq(7L -> "a a"))
    assert(got == Map((7L, 1L) -> (3L, 0)))
  }

  test("repeated phrase terms need every position to line up") {
    // "w w" must NOT match a doc with a single isolated w
    val got = run(Seq(1L -> "v w v w w u"), Seq(5L -> "w w"))
    assert(got == Map((5L, 1L) -> (1L, 3)))
  }

  test("phrase running off the end of a document does not match") {
    val got = run(Seq(1L -> "alpha beta"), Seq(3L -> "beta gamma"))
    assert(got.isEmpty)
  }

  test("empty phrase raises instead of matching everything") {
    val ex = intercept[RuntimeException] {
      run(Seq(1L -> "a b"), Seq(9L -> ""))
    }
    assert(ex.getMessage.contains("empty phrase"))
  }

  test("phrase side broadcasts; no window in the plan") {
    val plan = PhraseSearch.search(
        (0L to 50L).map(i => (i, s"tok$i a b")).toDF("doc_id", "text"),
        "doc_id", "text", Seq((1L, "a b")).toDF("query_id", "phrase"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("Window"))
  }
}
