package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkTestBase {
  private lazy val sp = spark
  import sp.implicits._

  test("planted verbatim 8-gram is reported with exact overlap counts") {
    val df = Seq(
      (0L, "a b c d e f g h i j"),            // benchmark (id % 20 == 0)
      (1L, "x y a b c d e f g h q"),          // shares the 8-gram "a b c d e f g h"
      (2L, "p q r s t u v w z1 z2 z3"),       // disjoint vocab -> clean
      (3L, "one two three")                   // < 8 tokens -> no grams at all
    ).toDF("doc_id", "text")
    val out = Decontaminate.ngramOverlap(df, "doc_id", "text",
      benchPred = col("doc_id") % 20 === 0, n = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // doc 1 has 4 distinct 8-grams (11 tokens), exactly one shared
    assert(out.keySet == Set(1L), s"unexpected contamination report: $out")
    assert(out(1L) == ((1L, 4L, 0.25)))
  }

  test("crossDupStats: shared spans counted symmetrically, unique docs report zero, short docs omitted") {
    val df = Seq(
      (0L, "a b c d e f g h i j"),      // shares "a b c d e f g h" with doc 1
      (1L, "x y a b c d e f g h q"),
      (2L, "p q r s t u v w z1 z2 z3"), // all grams unique to doc 2
      (3L, "one two three")             // < 8 tokens -> omitted
    ).toDF("doc_id", "text")
    val out = Decontaminate.crossDupStats(df, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out.keySet === Set(0L, 1L, 2L))
    assert(out(0L) === ((1L, 3L, math.round(1.0 / 3 * 1e6) / 1e6))) // 3 grams, 1 shared
    assert(out(1L) === ((1L, 4L, 0.25)))
    assert(out(2L) === ((0L, 4L, 0.0)))
  }

  test("benchmark n-gram set joins via broadcast (no corpus-sized shuffle)") {
    val df = (0L until 200L).map(i => (i, s"w${i % 7} a b c d e f g h w${i % 5} w${i % 3}"))
      .toDF("doc_id", "text")
    val plan = Decontaminate.ngramOverlap(df, "doc_id", "text",
      benchPred = col("doc_id") % 20 === 0).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"benchmark set not broadcast:\n$plan")
  }

  test("maximalSharedSpans recovers planted variable-length spans as ONE maximal span") {
    // docs 0 and 1 share the 5-token run "x1 x2 x3 x4 x5" at different
    // offsets; with k=3 that run seeds 3 consecutive shared starts which
    // must coalesce into a single (start, 5) span per doc — not 3 windows
    val df = Seq(
      (0L, "p1 p2 x1 x2 x3 x4 x5 p3 p4"),
      (1L, "q1 x1 x2 x3 x4 x5 q2"),
      (2L, "r1 r2 r3 r4 r5 r6 r7")
    ).toDF("doc_id", "text")
    val out = Decontaminate.maximalSharedSpans(df, "doc_id", "text", minTokens = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(out === Set((0L, 2, 5), (1L, 1, 5)), s"got $out")
  }

  test("maximalSharedSpans reports disjoint runs as separate spans, maximality per run") {
    // docs share TWO runs ("a1 a2 a3" and "b1 b2 b3 b4") split by
    // unshared filler — two spans each, lengths 3 and 4
    val df = Seq(
      (0L, "a1 a2 a3 u1 u2 b1 b2 b3 b4"),
      (1L, "a1 a2 a3 v1 v2 v3 b1 b2 b3 b4")
    ).toDF("doc_id", "text")
    val out = Decontaminate.maximalSharedSpans(df, "doc_id", "text", minTokens = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(out === Set((0L, 0, 3), (0L, 5, 4), (1L, 0, 3), (1L, 6, 4)), s"got $out")
  }

  test("maximalSharedSpans is cross-document: within-doc repetition alone is not a span") {
    val df = Seq(
      (0L, "x1 x2 x3 f1 x1 x2 x3"), // repeats internally, shared with nobody
      (1L, "z1 z2 z3 z4 z5 z6")
    ).toDF("doc_id", "text")
    val out = Decontaminate.maximalSharedSpans(df, "doc_id", "text", minTokens = 3).collect()
    assert(out.isEmpty, s"within-doc repetition must not report spans: ${out.mkString(",")}")
  }

  test("maximal-span union equals the window-union removal mask of removeSharedSpans") {
    // the removal action drops exactly the tokens covered by maximal
    // spans: token-count check per doc against removeSharedSpans(n=k)
    val df = Seq(
      (0L, "p1 p2 x1 x2 x3 x4 x5 p3 p4"),
      (1L, "q1 x1 x2 x3 x4 x5 q2"),
      (2L, "r1 r2 r3 r4 r5 r6 r7")
    ).toDF("doc_id", "text")
    val spanCover = Decontaminate.maximalSharedSpans(df, "doc_id", "text", minTokens = 3)
      .groupBy(col("id")).agg(sum(col("span_len")).as("covered"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val removed = Decontaminate.removeSharedSpans(df, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(2).toLong).toMap
    assert(removed === Map(0L -> spanCover.getOrElse(0L, 0L),
      1L -> spanCover.getOrElse(1L, 0L), 2L -> 0L),
      s"span cover $spanCover vs removed $removed")
  }

  test("NULL benchmark predicate counts as training doc — not a silent drop") {
    // a predicate over a NULL column evaluates NULL; under three-valued
    // logic both filter(p) and filter(!p) would drop the row — the
    // coalesce-to-false guard keeps it on the training side
    val df = Seq(
      (0L, "a b c d e f g h i j", Some(true)),
      (1L, "x y a b c d e f g h q", Some(false)),
      (2L, "k l m n o p q r s t", None)
    ).toDF("doc_id", "text", "flag")
    val rem = Decontaminate.removeContaminated(df, "doc_id", "text",
      benchPred = col("flag"), n = 8)
      .collect().map(_.getLong(0)).toSet
    assert(rem === Set(1L, 2L), s"NULL-flag doc must appear in training output: $rem")
    val ovl = Decontaminate.ngramOverlap(df, "doc_id", "text",
      benchPred = col("flag"), n = 8)
      .collect().map(_.getLong(0)).toSet
    assert(ovl === Set(1L), s"only doc 1 overlaps the bench set: $ovl")
  }

  test("removeContaminated masks exactly the matching windows, keeps the rest") {
    // bench doc 0 carries the 4-gram "a b c d"; training doc 1 embeds it
    // mid-text, doc 2 is clean, doc 3 is a verbatim copy of the bench doc
    val df = Seq(
      (0L, "a b c d"),
      (1L, "x y a b c d z w"),
      (2L, "p q r s t u v"),
      (3L, "a b c d")
    ).toDF("doc_id", "text")
    val out = Decontaminate.removeContaminated(df, "doc_id", "text",
      benchPred = col("doc_id") === 0L, n = 4)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(!out.contains(0L), "bench docs are not training output")
    assert(out(1L) == ((8, 4, "x y z w")))
    assert(out(2L) == ((7, 0, "p q r s t u v")))
    assert(out(3L) == ((4, 4, ""))) // fully contaminated → empty survivor
  }

  test("removeSharedSpans strips corpus-repeated windows, keeps unique text") {
    // "LICENSE TEXT HERE BLOCK" is shared boilerplate across docs 0 and 1;
    // doc 2 is all-unique and must pass through untouched
    val df = Seq(
      (0L, "alpha beta LICENSE TEXT HERE BLOCK gamma"),
      (1L, "LICENSE TEXT HERE BLOCK delta epsilon"),
      (2L, "zeta eta theta iota kappa")
    ).toDF("doc_id", "text")
    val out = Decontaminate.removeSharedSpans(df, "doc_id", "text", n = 4)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(out(0L) == ((7, 4, "alpha beta gamma")))
    assert(out(1L) == ((6, 4, "delta epsilon")))
    assert(out(2L) == ((5, 0, "zeta eta theta iota kappa")))
  }

  test("removeSharedSpans honors minDocs and rejects minDocs < 2") {
    // the span repeats in 2 docs: minDocs=3 keeps it, minDocs=2 strips it
    val df = Seq(
      (0L, "a b c d x"),
      (1L, "y a b c d"),
      (2L, "p q r s t")
    ).toDF("doc_id", "text")
    val strict = Decontaminate.removeSharedSpans(df, "doc_id", "text", n = 4, minDocs = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(strict == Map(0L -> 0, 1L -> 0, 2L -> 0))
    intercept[IllegalArgumentException] {
      Decontaminate.removeSharedSpans(df, "doc_id", "text", n = 4, minDocs = 1)
    }
  }

  test("overlapping matches union their windows, not double-count") {
    // bench has "a a a a" ; training "a a a a a" matches at starts 0 and 1
    // → masked positions 0..4 = all five tokens
    val df = Seq((0L, "a a a a"), (1L, "a a a a a")).toDF("doc_id", "text")
    val out = Decontaminate.removeContaminated(df, "doc_id", "text",
      benchPred = col("doc_id") === 0L, n = 4).collect().head
    assert(out.getInt(1) == 5 && out.getInt(2) == 5 && out.getString(3) == "")
  }
}
