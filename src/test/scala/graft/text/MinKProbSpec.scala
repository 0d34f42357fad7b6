package graft.text

import graft.SparkTestBase

class MinKProbSpec extends SparkTestBase {
  import spark.implicits._

  // unigrams: a=4, b=4, c=1, x=1 → V=4
  // bigrams: (a,b)=4, (b,a)=1, (b,c)=1
  private def corpus = Seq(
    (0L, "a b a b"), (1L, "a b"), (2L, "a b c"), (3L, "x")
  ).toDF("doc_id", "text")

  private def pin(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def run(k: Int) =
    LmScore.minKProb(corpus, "doc_id", "text", k)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]))))
      .toMap

  test("min-k selects exactly the highest-nll bigrams (hand oracle)") {
    // doc 0 bigrams: (a,b), (b,a), (a,b) → nlls: nAB, nBA, nAB with
    // nBA > nAB (c12(b,a)=1 vs c12(a,b)=4) — k=34% of 3 → n_scored=1 →
    // the single worst bigram, (b,a)
    val nBA = -math.log((1.0 + 1) / (4 + 4))
    val out = run(34)
    assert(out(0L)._1 == 3L && out(0L)._2 == 1L)
    assert(out(0L)._3.get == pin(pin(nBA) / 1))
  }

  test("k=100 means min-k == the plain mean over 6-dp pinned scores") {
    val nAB = -math.log((4.0 + 1) / (4 + 4))
    val nBC = -math.log((1.0 + 1) / (4 + 4))
    val out = run(100)
    assert(out(2L)._1 == 2L && out(2L)._2 == 2L)
    assert(out(2L)._3.get == pin((pin(nAB) + pin(nBC)) / 2))
  }

  test("floor never starves a short doc: n_scored >= 1") {
    val out = run(1) // 1% of 2 bigrams floors to 0 → clamped to 1
    assert(out(1L)._2 == 1L)
    assert(out(2L)._2 == 1L)
    // doc 2's worst bigram is the rare (b,c)
    val nBC = -math.log((1.0 + 1) / (4 + 4))
    assert(out(2L)._3.get == pin(pin(nBC) / 1))
  }

  test("docs without bigrams surface as (0, 0, NULL)") {
    val out = run(20)
    assert(out(3L) == ((0L, 0L, None)))
  }

  test("member-like text scores lower min-k than outlier text") {
    // doc 1 ("a b") is pure corpus-typical; doc 2 carries the rare tail
    val out = run(50)
    assert(out(1L)._3.get < out(2L)._3.get)
  }

  test("kPct outside [1,100] is rejected") {
    intercept[IllegalArgumentException] {
      LmScore.minKProb(corpus, "doc_id", "text", 0)
    }
  }
}
