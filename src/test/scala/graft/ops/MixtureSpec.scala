package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class MixtureSpec extends SparkTestBase {
  import spark.implicits._

  // group a: 2 docs × 50 tokens = 100; group b: 3 docs × 100 tokens = 300
  private def corpus = (
    Seq((0L, Seq.fill(50)("w").mkString(" "), "a"),
        (1L, Seq.fill(50)("w").mkString(" "), "a")) ++
    (2L to 4L).map(i => (i, Seq.fill(100)("w").mkString(" "), "b"))
  ).toDF("doc_id", "text", "grp")

  private val tokens = size(split(col("text"), " "))

  test("rates: limiting group keeps everything, the rest scale to the target mixture") {
    // w = 0.5/0.5: T = min(100/0.5, 300/0.5) = 200
    // rate_a = 0.5·200/100 = 1.0; rate_b = 0.5·200/300 = 1/3
    val r = Mixture.mixtureRates(corpus, "grp", tokens,
      Map("a" -> 0.5, "b" -> 0.5))
    assert(r("a") === 1.0)
    assert(r("b") === 100.0 / 300.0)
  }

  test("sample is a deterministic subset; limiting group survives intact; unweighted groups drop") {
    val withJunk = corpus.union(Seq((9L, "x y", "zz")).toDF)
    def run() = Mixture.mixtureSample(withJunk, "doc_id", "grp", tokens,
      Map("a" -> 0.5, "b" -> 0.5)).select("doc_id").as[Long].collect().sorted.toSeq
    val s = run()
    assert(s === run(), "hash acceptance must be deterministic")
    assert(Seq(0L, 1L).forall(s.contains), "rate-1.0 group must be fully kept")
    assert(!s.contains(9L), "group without a target weight must be dropped")
    assert(s.toSet.subsetOf(Set(0L, 1L, 2L, 3L, 4L)))
  }

  test("report aggregates the sampled rows and carries the rounded rate") {
    val rep = Mixture.mixtureReport(corpus, "doc_id", "grp", tokens,
      Map("a" -> 0.5, "b" -> 0.5)).orderBy("grp").collect()
    val a = rep.find(_.getString(0) == "a").get
    assert(a.getAs[Long]("n_docs") === 2L && a.getAs[Long]("n_tokens") === 100L)
    assert(a.getAs[Double]("rate") === 1.0)
    val b = rep.find(_.getString(0) == "b").get
    assert(b.getAs[Double]("rate") === math.round(100.0 / 300.0 * 1e6) / 1e6)
    assert(b.getAs[Long]("n_tokens") === b.getAs[Long]("n_docs") * 100L)
  }

  test("a weighted group with no rows is an explicit error, not a silent skip") {
    intercept[IllegalArgumentException] {
      Mixture.mixtureRates(corpus, "grp", tokens,
        Map("a" -> 0.5, "nope" -> 0.5))
    }
  }
}
