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

  test("perplexityBuckets under the KN LM: same fluency ordering, bigram-less omitted") {
    val rows = (0L to 2L).map(i => (i, "a b a b a b")) ++
      (3L to 5L).map(i => (i, "a b c d")) ++
      (6L to 8L).map(i => (i, "e f g h")) :+ (9L, "x")
    val df = rows.toDF("doc_id", "text")
    val out = LmScore.perplexityBuckets(df, "doc_id", "text", kneserNey = true)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(!out.contains(9L))
    // the heavily-supported (a,b) docs are the most fluent under KN too
    assert((0L to 2L).forall(out(_) == "head"), s"KN head wrong: $out")
    // identical docs always share a bucket, and the other two groups fill
    // the other two terciles (KN ranks them by ITS counts — "e f g h"'s
    // self-supported bigrams beat "a b c d"'s rare tail, unlike add-one)
    assert(Set(out(3L)) == (3L to 5L).map(out).toSet)
    assert(Set(out(6L)) == (6L to 8L).map(out).toSet)
    assert(Set(out(3L), out(6L)) == Set("middle", "tail"), s"KN buckets wrong: $out")
  }

  test("Kneser-Ney: hand-computed interpolated probabilities") {
    // docs: "a b a b", "a c"
    // bigram occurrences doc0: (a,b),(b,a),(a,b); doc1: (a,c)
    // types: (a,b)=2, (b,a)=1, (a,c)=1
    // ctx(a)=3 fanout(a)=2; ctx(b)=1 fanout(b)=1
    // cont(a)=1, cont(b)=1, cont(c)=1; ntypes=3
    val df = Seq((0L, "a b a b"), (1L, "a c"), (2L, "x")).toDF("doc_id", "text")
    val out = LmScore.nllKneserNey(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]))))
      .toMap
    val pAB = (2 - 0.75) / 3 + 0.75 * 2 / 3.0 * (1.0 / 3) // 0.5833...
    val pBA = (1 - 0.75) / 1 + 0.75 * 1 / 1.0 * (1.0 / 3) // 0.5
    val pAC = (1 - 0.75) / 3 + 0.75 * 2 / 3.0 * (1.0 / 3) // 0.25
    val eps = 1e-9
    assert(out(0L)._1 == 3L)
    assert(math.abs(out(0L)._2.get - -(2 * math.log(pAB) + math.log(pBA)) / 3) < eps)
    assert(out(1L)._1 == 1L && math.abs(out(1L)._2.get - -math.log(pAC)) < eps)
    // a doc with no bigrams scores NULL, not 0
    assert(out(2L)._1 == 0L && out(2L)._2.isEmpty)
  }

  test("Kneser-Ney: per-context probabilities sum to exactly 1") {
    // For every context w1: sum_{observed w2} (c12-D)/ctx1 = 1 - D*fanout1/ctx1,
    // and the interpolation weight times sum_{all second words} Pcont = that
    // remainder — so summing exp(-nll) of single-bigram probes over the FULL
    // (context x second-word) grid must give exactly |contexts|. The corpus
    // here is built so the grid IS the observed bigram set.
    val df = Seq((0L, "a b"), (1L, "a c"), (2L, "b b"), (3L, "b c")).toDF("doc_id", "text")
    // every doc is one bigram; all 4 (w1,w2) types observed once.
    // ctx(a)=2 fanout(a)=2; ctx(b)=2 fanout(b)=2; cont(b)=2, cont(c)=2; ntypes=4
    val nll = LmScore.nllKneserNey(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val total = nll.values.map(v => math.exp(-v)).sum
    assert(math.abs(total - 2.0) < 1e-9, s"prob mass != |contexts|: $total")
  }

  test("Kneser-Ney: hot-key salting is result-invariant (to summation order)") {
    // the per-bigram nlp values are computed BEFORE salting, so variants
    // score the same multiset per doc; only the avg's partition-dependent
    // summation ORDER can move the result, by ulps — far inside the gate's
    // 6-dp rounding
    val df = ((0L to 7L).map(i => (i, "of the of the of the end " + ("w" + i))) :+
      (8L, "rare words only here")).toDF("doc_id", "text")
    val baseline = LmScore.nllKneserNey(df, "doc_id", "text", hotK = 1024, saltN = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))
      .sortBy(_._1)
    for ((k, s) <- Seq((1, 4), (2, 8), (1024, 16))) {
      val salted = LmScore.nllKneserNey(df, "doc_id", "text", hotK = k, saltN = s)
        .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))
        .sortBy(_._1)
      baseline.zip(salted).foreach { case ((i0, n0, v0), (i1, n1, v1)) =>
        assert(i0 == i1 && n0 == n1, s"hotK=$k saltN=$s structure diverged")
        assert((v0.isEmpty && v1.isEmpty) ||
          math.abs(v0.get - v1.get) < 1e-12, s"hotK=$k saltN=$s value diverged")
      }
    }
  }

  test("cross scoring: unseen bigrams and histories fall back to c = 0 add-one") {
    // LM trained on `corpus` (unigrams a=3,b=3,c=1,x=1 → V=4; bigrams
    // (a,b)=3,(b,c)=1); score a frame with one seen bigram, one unseen
    // bigram over a seen history, and one fully-unseen history
    val toScore = Seq(
      (10L, "a b"),  // seen:       p = (3+1)/(3+4)
      (11L, "a c"),  // unseen pair: p = (0+1)/(3+4)
      (12L, "z q")   // unseen hist: p = (0+1)/(0+4)
    ).toDF("doc_id", "text")
    val out = LmScore.nllPerDocCross(corpus, toScore, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val eps = 1e-12
    assert(math.abs(out(10L) - -math.log(4.0 / 7)) < eps)
    assert(math.abs(out(11L) - -math.log(1.0 / 7)) < eps)
    assert(math.abs(out(12L) - -math.log(1.0 / 4)) < eps)
  }

  test("cross scoring with train == score is row-identical to nllPerDoc") {
    val df = ((0L to 7L).map(i => (i, "of the of the end " + ("w" + i))) :+
      (8L, "x")).toDF("doc_id", "text")
    val self = LmScore.nllPerDoc(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).sortBy(_._1)
    val cross = LmScore.nllPerDocCross(df, df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).sortBy(_._1)
    assert(self.toSeq == cross.toSeq)
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
