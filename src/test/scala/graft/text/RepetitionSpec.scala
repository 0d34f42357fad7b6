package graft.text

import graft.SparkTestBase

class RepetitionSpec extends SparkTestBase {
  import spark.implicits._

  test("top/dup n-gram fractions on hand-checked docs") {
    // doc 1: "a b a b a b" — top 2-gram "a b" occurs 3× of 5 grams,
    //   chars = 11, topchars = 3 * len("a b") = 9
    //   5-grams: "a b a b a", "b a b a b" — both unique → dup_frac 0
    // doc 2: all-distinct tokens → no repeated 2-gram (top c=1)
    // doc 3: shorter than 2 tokens → both signals 0
    val docs = Seq(
      (1L, "a b a b a b"),
      (2L, "v w x y z"),
      (3L, "q")
    ).toDF("doc_id", "text")

    val out = Repetition.ngramStats(docs, "doc_id", "text")
      .as[(Long, Double, Double)].collect().sortBy(_._1)

    assert(out(0) === ((1L, math.round(9.0 / 11 * 1e6) / 1e6, 0.0)))
    // doc 2: top gram count 1, len("v w") = 3, chars = 9 → 3/9
    assert(out(1) === ((2L, math.round(3.0 / 9 * 1e6) / 1e6, 0.0)))
    assert(out(2) === ((3L, 0.0, 0.0)))
  }

  test("dup fraction counts duplicate occurrences, not duplicate grams") {
    // "c d c d c d c d" 5-grams: "c d c d c"×2, "d c d c d"×2 → 4 of 4
    val docs = Seq((1L, "c d c d c d c d")).toDF("doc_id", "text")
    val out = Repetition.ngramStats(docs, "doc_id", "text")
      .as[(Long, Double, Double)].collect()
    assert(out(0)._3 === 1.0)
  }
}
