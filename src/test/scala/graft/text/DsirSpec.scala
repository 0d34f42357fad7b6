package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class DsirSpec extends SparkTestBase {
  import spark.implicits._

  test("logWeights ranks target-like docs above target-unlike docs") {
    // target talks about "cat dog"; source doc 1 shares that vocabulary,
    // doc 3 is disjoint — doc 1 must carry the higher importance weight
    val df = Seq(
      (0L, "cat dog cat dog"),   // target
      (1L, "cat dog bird"),      // source, target-like
      (3L, "rock sand lava")     // source, target-unlike
    ).toDF("doc_id", "text")
    val w = Dsir.logWeights(df, "doc_id", "text",
      targetPred = col("doc_id") === 0L, nBuckets = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w.keySet == Set(1L, 3L), "target docs must not be scored")
    assert(w(1L) > w(3L), s"target-like doc not preferred: $w")
  }

  test("logWeights matches the hand-computed likelihood ratio") {
    // single-token docs pin each token to one bucket count: target = {x},
    // source = {x, y} -> for the x-doc: lw = ln(2)-ln(2) = 0 over 1 token,
    // total term = ln(1+B) - ln(2+B)
    val b = 1024
    val df = Seq((0L, "x"), (1L, "x"), (2L, "y")).toDF("doc_id", "text")
    val w = Dsir.logWeights(df, "doc_id", "text",
      targetPred = col("doc_id") === 0L, nBuckets = b)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val tot = math.log(1.0 + b) - math.log(2.0 + b)
    assert(math.abs(w(1L) - r6(math.log(2) - math.log(2) - 1 * tot)) < 1e-9)
    assert(math.abs(w(2L) - r6(math.log(1) - math.log(2) - 1 * tot)) < 1e-9)
    assert(w(1L) > w(2L))
  }

  test("NULL target predicate counts as source doc — not a silent drop") {
    val df = Seq(
      (0L, "cat dog", Some(true)),
      (1L, "cat bird", Some(false)),
      (2L, "rock sand", None)
    ).toDF("doc_id", "text", "flag")
    val w = Dsir.logWeights(df, "doc_id", "text",
      targetPred = col("flag"), nBuckets = 64)
      .collect().map(_.getLong(0)).toSet
    assert(w === Set(1L, 2L), s"NULL-flag doc must be scored as source: $w")
  }

  test("select takes top-k via TakeOrdered (no global sort) with id tie-break") {
    val df = (0L to 40L).map(i => (i, if (i % 4 == 0) "cat dog" else "rock sand"))
      .toDF("doc_id", "text")
    val sel = Dsir.select(df, "doc_id", "text",
      targetPred = col("doc_id") === 0L, k = 5, nBuckets = 64)
    val plan = sel.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"top-k is a global sort:\n$plan")
    val ids = sel.collect().map(_.getLong(0)).toSeq
    assert(ids.length == 5)
    // the cat-dog docs (i % 4 == 0, minus the target doc 0) win, id-ordered
    assert(ids == Seq(4L, 8L, 12L, 16L, 20L))
  }
}
