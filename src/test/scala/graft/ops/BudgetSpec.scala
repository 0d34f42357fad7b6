package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class BudgetSpec extends SparkTestBase {
  import spark.implicits._

  test("binRates: greedy fill from the top bin, fractional boundary, zero below") {
    // bins (score-bin -> tokens): 90->100, 80->200, 70->400
    val r = Budget.binRates(Seq((70, 400L), (90, 100L), (80, 200L)), budget = 400L)
    assert(r(90) === 1.0) // above=0, 0+100 <= 400
    assert(r(80) === 1.0) // above=100, 100+200 <= 400
    assert(r(70) === 100.0 / 400.0) // above=300: keep 100 of 400
    assert(Budget.binRates(Seq((50, 10L)), 0L)(50) === 0.0)
    assert(Budget.binRates(Seq((50, 10L)), 999L)(50) === 1.0)
  }

  test("selectByBudget keeps high bins wholly, drops low bins, lands near budget") {
    // 40 docs: half score ~0.9 (10 tokens each), half ~0.1 (10 tokens each)
    val docs = ((0L until 20L).map(i => (i, 0.95, 10)) ++
      (20L until 40L).map(i => (i, 0.05, 10)))
      .toDF("doc_id", "score", "ntok")
    val kept = Budget.selectByBudget(docs, "doc_id", col("ntok"), col("score"),
      budget = 200L).select("doc_id").as[Long].collect().toSet
    // top bin alone holds exactly 200 tokens -> all of it, none of the rest
    assert(kept === (0L until 20L).toSet)
  }

  test("boundary bin is hash-sampled deterministically and budget rises monotonically") {
    val docs = (0L until 100L).map(i => (i, 0.5, 10)).toDF("doc_id", "score", "ntok")
    def run(b: Long) = Budget.selectByBudget(docs, "doc_id", col("ntok"), col("score"), b)
      .select("doc_id").as[Long].collect().toSet
    val half = run(500L)
    assert(half === run(500L), "hash acceptance must be deterministic")
    assert(half.size > 20 && half.size < 80, s"~half expected, got ${half.size}")
    assert(half.subsetOf(run(900L)), "raising the budget must only add docs")
    assert(run(1000L).size === 100)
  }

  test("negative scores clamp to the bottom bin instead of corrupting the histogram") {
    // one doc at score -0.3: with a generous budget it is still selectable
    // (bin 0), and with a tight budget the high bin wins over it
    val docs = Seq((0L, 0.9, 10), (1L, -0.3, 10)).toDF("doc_id", "score", "ntok")
    val all = Budget.selectByBudget(docs, "doc_id", col("ntok"), col("score"), 100L)
      .select("doc_id").as[Long].collect().toSet
    assert(all === Set(0L, 1L))
    val tight = Budget.selectByBudget(docs, "doc_id", col("ntok"), col("score"), 10L)
      .select("doc_id").as[Long].collect().toSet
    assert(tight === Set(0L))
  }

  test("a null score fails the job loudly, not an NPE at collect") {
    val docs = Seq((0L, Some(0.9), 10), (1L, Option.empty[Double], 10))
      .toDF("doc_id", "score", "ntok")
    val e = intercept[Exception] {
      Budget.selectByBudget(docs, "doc_id", col("ntok"), col("score"), 100L).count()
    }
    assert(e.getMessage != null)
  }

  test("property: kept token mass = min(budget, total); rates in [0,1], monotone by bin (200 random histograms)") {
    val rng = new scala.util.Random(42)
    for (_ <- 0 until 200) {
      val hist = (0 until rng.nextInt(30))
        .map(_ => (rng.nextInt(100), rng.nextLong(10000) + 1))
        .groupBy(_._1).map { case (b, xs) => (b, xs.map(_._2).sum) }.toSeq
      val budget = rng.nextLong(500000)
      val rates = Budget.binRates(hist, budget)
      assert(rates.values.forall(r => r >= 0.0 && r <= 1.0))
      val kept = hist.map { case (b, tok) => rates(b) * tok }.sum
      val total = hist.map(_._2).sum
      assert(math.abs(kept - math.min(budget, total)) < 1e-6,
        s"kept $kept != min($budget, $total) for $hist")
      val byBinDesc = hist.map(_._1).distinct.sorted.reverse.map(rates)
      assert(byBinDesc.zip(byBinDesc.drop(1)).forall { case (hi, lo) => hi >= lo },
        s"rates not monotone from top bin: $rates")
    }
  }
}
