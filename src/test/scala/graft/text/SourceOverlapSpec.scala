package graft.text

import graft.SparkTestBase

class SourceOverlapSpec extends SparkTestBase {
  import spark.implicits._

  // 2-grams for hand-checkable sets:
  //  A: "a b c"   → {a b, b c}
  //  A: "x y"     → {x y}          (A total: 3)
  //  B: "a b d"   → {a b, b d}     (B total: 2)
  //  C: "p q"     → {p q}          (C total: 1, shares nothing)
  private def docs = Seq(
    ("A", "a b c"), ("A", "x y"), ("B", "a b d"), ("C", "p q")
  ).toDF("source", "text")

  test("matrix counts distinct shared grams with exact jaccard") {
    val out = SourceOverlap.overlapMatrix(docs, "text", "source", n = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(("A", "B", 1L, 0.25))) // {a b} / (3 + 2 - 1)
  }

  test("duplicate grams inside one source count once") {
    val d = Seq(("A", "a b a b"), ("B", "a b")).toDF("source", "text")
    // A's 2-grams: {a b, b a} (the repeat of "a b" dedupes) → shared 1, J = 1/2
    val out = SourceOverlap.overlapMatrix(d, "text", "source", n = 2).collect()
    assert(out.head.getLong(2) == 1L && out.head.getDouble(3) == 0.5)
  }

  test("short docs contribute no grams; disjoint sources emit no row") {
    val d = Seq(("A", "a"), ("B", "b c"), ("C", "d e")).toDF("source", "text")
    assert(SourceOverlap.overlapMatrix(d, "text", "source", n = 2).count() == 0)
  }

  test("three-way shared gram lands in all three pairs, ordered a < b") {
    val d = Seq(("B", "k k"), ("A", "k k"), ("C", "k k")).toDF("source", "text")
    val out = SourceOverlap.overlapMatrix(d, "text", "source", n = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("A", "B"), ("A", "C"), ("B", "C")))
  }
}
