package graft.text

import graft.SparkTestBase

class TfIdfSpec extends SparkTestBase {
  import spark.implicits._

  // 3 docs: "rare" appears only in doc 0; "common" in all
  private def corpus = Seq(
    (0L, "common rare common"),
    (1L, "common other common other"),
    (2L, "common third")
  ).toDF("doc_id", "text")

  test("tf-idf matches the sklearn smoothed-idf hand computation") {
    val out = TfIdf.topTerms(corpus, "doc_id", "text", k = 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    def idf(df: Long) = math.log(4.0 / (1 + df)) + 1 // N=3 → (1+3)/(1+df)
    val eps = 1e-12
    val d0 = out.filter(_._1 == 0L).map(t => t._2 -> ((t._3, t._4))).toMap
    assert(d0("rare")._1 == 1L && math.abs(d0("rare")._2 - idf(1)) < eps)
    assert(d0("common")._1 == 2L && math.abs(d0("common")._2 - 2 * idf(3)) < eps)
  }

  test("rank orders by score desc with lexicographic tie-break; k truncates") {
    val out = TfIdf.topTerms(corpus, "doc_id", "text", k = 1)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(4)))
    assert(out.length == 3 && out.forall(_._3 == 1))
    // doc 0: rare (tf 1 · idf 0.693+1) vs common (tf 2 · idf ln(1)+1 = 2.0):
    // 2.0 > 1.693 → common wins despite being corpus-wide
    assert(out.find(_._1 == 0L).get._2 == "common")
    // doc 1: other (2·idf(1)) beats common (2·1.0)
    assert(out.find(_._1 == 1L).get._2 == "other")
  }

  test("per-doc term windows never mix documents") {
    val out = TfIdf.topTerms(corpus, "doc_id", "text", k = 10)
      .collect().groupBy(_.getLong(0))
    assert(out(0L).map(_.getString(1)).toSet == Set("common", "rare"))
    assert(out(2L).map(_.getString(1)).toSet == Set("common", "third"))
  }
}
