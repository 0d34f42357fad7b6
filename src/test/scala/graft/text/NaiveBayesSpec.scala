package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class NaiveBayesSpec extends SparkTestBase {
  import spark.implicits._

  test("classify matches hand-computed multinomial NB with add-one smoothing") {
    // train: en = {the cat, the dog}, fr = {le chat}
    // vocab V = {the, cat, dog, le, chat} = 5; T_en = 4, T_fr = 2
    // N = 3 docs, N_en = 2, N_fr = 1
    val train = Seq(
      ("en", "the cat"), ("en", "the dog"), ("fr", "le chat")
    ).toDF("lang", "text")
    val test = Seq((1L, "the cat"), (2L, "le chat")).toDF("doc_id", "text")
    val out = NaiveBayes.classify(train, test, "doc_id", "lang", "text")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap

    def score(prior: Double, lws: Seq[Double], nToks: Int, tot: Int): Double =
      math.log(prior) + lws.sum - nToks * math.log(tot + 5.0)
    // Spark's round() is decimal HALF_UP, not rint
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 1 "the cat" under en: c(the)=2, c(cat)=1
    val en1 = score(2.0 / 3, Seq(math.log(3), math.log(2)), 2, 4)
    // under fr: both unseen -> lw = 0
    val fr1 = score(1.0 / 3, Seq(), 2, 2)
    assert(en1 > fr1)
    assert(out(1L)._1 == "en")
    assert(math.abs(out(1L)._2 - r6(en1)) < 1e-9)
    // doc 2 "le chat": fr has c(le)=c(chat)=1, en sees nothing
    val fr2 = score(1.0 / 3, Seq(math.log(2), math.log(2)), 2, 2)
    val en2 = score(2.0 / 3, Seq(), 2, 4)
    assert(fr2 > en2)
    assert(out(2L)._1 == "fr")
    assert(math.abs(out(2L)._2 - r6(fr2)) < 1e-9)
  }

  test("ties break to the smallest label; all-unseen docs still classify") {
    // symmetric training: every label sees the same counts, so a test doc
    // of unseen tokens scores each label by prior+denom alone — identical
    // here, so the tie must deterministically pick the smallest label
    val train = Seq(("a", "x y"), ("b", "p q")).toDF("lab", "text")
    val test = Seq((7L, "zz ww")).toDF("doc_id", "text")
    val out = NaiveBayes.classify(train, test, "doc_id", "lab", "text").collect()
    assert(out.length == 1 && out.head.getString(1) == "a")
  }

  test("label frame broadcasts; model join is not a broadcast of the corpus") {
    val train = Seq(("en", "the cat"), ("fr", "le chat")).toDF("lang", "text")
    val test = Seq((1L, "the chat")).toDF("doc_id", "text")
    val plan = NaiveBayes.classify(train, test, "doc_id", "lang", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"label frame not broadcast:\n$plan")
  }
}
