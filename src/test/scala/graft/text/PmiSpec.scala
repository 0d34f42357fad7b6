package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class PmiSpec extends SparkTestBase {
  import spark.implicits._

  private def pin(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def docs = Seq(
    (1L, "new york is big"),
    (2L, "new york is old"),
    (3L, "big apple is new")
  ).toDF("doc_id", "text")

  test("pmi matches the hand computation in the same operation order") {
    val out = Pmi.collocations(docs, col("text"), minCount = 2, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    // bigrams: (new,york)=2 (is,big)=1 (new,york)… total B = 9;
    // unigrams: new=3 york=2 is=3 big=2 old=1 apple=1 → T = 12
    val b = 9.0; val t = 12.0
    def pmi(c12: Double, c1: Double, c2: Double) =
      pin(math.log(c12) - math.log(b) - math.log(c1) - math.log(c2) +
        math.log(t) + math.log(t))
    assert(out(("new", "york")) == ((2L, pmi(2, 3, 2))))
    // hapax pairs are screened by minCount
    assert(!out.contains(("is", "big")))
    assert(!out.contains(("big", "apple")))
  }

  test("collocations outrank chance pairs") {
    val out = Pmi.collocations(docs, col("text"), minCount = 1, k = 100)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    // (new, york) is a true collocation: every 'york' follows 'new';
    // (is, new) co-occurs once despite both being frequent
    assert(out(("new", "york")) > out(("is", "new")))
  }

  test("stopword discovery thresholds on document frequency, not raw count") {
    val d = Seq(
      (1L, "the the the cat"), // 'the' 3x in ONE doc — df is still 1
      (2L, "the dog"),
      (3L, "the bird"),
      (4L, "a fish")
    ).toDF("doc_id", "text")
    val out = Pmi.stopwordDiscovery(d, col("doc_id"), col("text"), 0.5)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3))))
      .toMap
    assert(out("the") == ((3L, 0.75, true)))
    assert(out("cat") == ((1L, 0.25, false)))
    assert(out("a") == ((1L, 0.25, false)))
  }
}
