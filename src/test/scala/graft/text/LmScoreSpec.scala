package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class LmScoreSpec extends SparkTestBase {
  import spark.implicits._

  // corpus: "a b" ×2, "a b c", "x" (no bigrams)
  // unigrams: a=3, b=3, c=1, x=1 → V=4
  // bigrams:  (a,b)=3, (b,c)=1
  private def corpus = Seq(
    (0L, "a b"), (1L, "a b"), (2L, "a b c"), (3L, "x")
  ).toDF("doc_id", "text")

  test("nll matches the hand-computed add-one bigram LM") {
    val out = LmScore.nllPerDoc(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]))))
      .toMap
    val pAB = (3.0 + 1) / (3 + 4) // c12=3, c1(a)=3, V=4
    val pBC = (1.0 + 1) / (3 + 4) // c12=1, c1(b)=3, V=4
    val eps = 1e-12
    assert(out(0L)._1 == 1L && math.abs(out(0L)._2.get - -math.log(pAB)) < eps)
    assert(out(1L) == out(0L), "identical docs score identically")
    assert(out(2L)._1 == 2L &&
      math.abs(out(2L)._2.get - (-math.log(pAB) - math.log(pBC)) / 2) < eps)
    // a doc with no bigrams scores NULL, not 0 — explicit absence
    assert(out(3L)._1 == 0L && out(3L)._2.isEmpty)
  }

  test("rarer sequences score higher nll than corpus-typical ones") {
    val out = LmScore.nllPerDoc(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    // doc 2 contains the rare (b,c) bigram → higher mean nll than pure (a,b)
    assert(out(2L).get > out(0L).get)
  }

  test("perplexityBuckets: terciles split by fluency, bigram-less docs omitted") {
    // nine docs with three distinct nll levels (three of each): the most
    // corpus-typical bigrams land in head, the rarest in tail
    val rows = (0L to 2L).map(i => (i, "a b a b a b")) ++     // common (a,b)
      (3L to 5L).map(i => (i, "a b c d")) ++                   // mixed
      (6L to 8L).map(i => (i, "e f g h")) :+ (9L, "x")         // rare; no-bigram doc
    val df = rows.toDF("doc_id", "text")
    val out = LmScore.perplexityBuckets(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getString(2)))).toMap
    assert(!out.contains(9L), "bigram-less doc must be omitted")
    assert((0L to 2L).forall(out(_)._2 == "head"), s"common docs not head: $out")
    assert((6L to 8L).forall(out(_)._2 == "tail"), s"rare docs not tail: $out")
    assert((3L to 5L).forall(out(_)._2 == "middle"))
    assert(out(0L)._1 < out(3L)._1 && out(3L)._1 < out(6L)._1)
  }

  test("counts weight repeated bigrams — not distinct-gram semantics") {
    val df = Seq((0L, "w w w")).toDF("doc_id", "text") // bigram (w,w) ×2
    val out = LmScore.nllPerDoc(df, "doc_id", "text").collect().head
    assert(out.getLong(1) == 2L) // both positions counted
    // c12=2, c1(w)=3, V=1 → p=(2+1)/(3+1)
    assert(math.abs(out.getDouble(2) - -math.log(3.0 / 4)) < 1e-12)
  }

  test("hot-key salting is result-invariant: scores identical at every (hotK, saltN)") {
    // Zipf-ish corpus: "of the" dominates — with hotK=1 only that key is
    // salted, with hotK=1024 every key is; all variants must agree exactly
    val df = ((0L to 7L).map(i => (i, "of the of the of the end " + ("w" + i))) :+
      (8L, "rare words only here")).toDF("doc_id", "text")
    val baseline = LmScore.nllPerDoc(df, "doc_id", "text", hotK = 1024, saltN = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).sortBy(_._1)
    for ((k, s) <- Seq((1, 4), (2, 8), (1024, 16))) {
      val salted = LmScore.nllPerDoc(df, "doc_id", "text", hotK = k, saltN = s)
        .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).sortBy(_._1)
      assert(salted.toSeq == baseline.toSeq, s"hotK=$k saltN=$s diverged")
    }
  }

  test("salting plan shape: broadcast marker joins, scoring shuffle keyed on salt") {
    val df = (0L to 7L).map(i => (i, "of the end " + ("w" + i))).toDF("doc_id", "text")
    val scored = LmScore.nllPerDoc(df, "doc_id", "text")
    scored.collect()
    val plan = scored.queryExecution.executedPlan.toString
    // the two hot-marker frames and their probe-side lookups are broadcast,
    // never shuffled (TakeOrdered bounds them; BroadcastHashJoin consumes)
    assert(plan.contains("TakeOrderedAndProject"), s"hot-marker not TakeOrdered:\n$plan")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"hot-marker joins not broadcast:\n$plan")
    // the scoring shuffles carry the salt in their join keys
    assert(plan.contains("bsalt") && plan.contains("usalt"),
      s"scoring join keys lost the salt:\n$plan")
  }
}
