package graft.search

import graft.SparkTestBase
import graft.cv.PanelSplit
import graft.ml.MeanRegressor
import graft.pipeline.SequentialCVPipeline
import org.apache.spark.ml.{Estimator, Model}

class SearchSpec extends SparkTestBase {
  private lazy val sp = spark
  import sp.implicits._

  private def est(e: Estimator[_ <: Model[_]]): Estimator[_ <: Model[_]] = e

  private def panel = {
    // y uncorrelated with period (like tests/df_generation.py's year): the
    // unshifted train mean is the best constant predictor
    val rows = for (p <- 1 to 10; i <- 0 to 3) yield (p * 10 + i, p, i.toDouble)
    rows.toDF("id", "period", "y")
  }

  private def pipe(df: org.apache.spark.sql.DataFrame) = {
    val cv = PanelSplit(df, "period", nSplits = 3, testSize = 1)
    new SequentialCVPipeline(
      Seq("mu" -> est(new MeanRegressor().setLabelCol("y"))), Seq(Some(cv)))
  }

  test("GridSearch: best candidate by mean score, rank ties->min, refit") {
    val df = panel
    val gs = new GridSearch(pipe(df),
      Map("mu__shift" -> Seq(0.0, 5.0, 100.0)),
      scoring = Seq("neg_mean_squared_error"), labelCol = "y")
    gs.fit(df)
    assert(gs.results.size == 3)
    assert(gs.bestParams == Map("mu__shift" -> 0.0))
    assert(gs.results.sortBy(_.rank("neg_mean_squared_error"))
      .map(m => m.params("mu__shift")) == Seq(0.0, 5.0, 100.0))
    assert(gs.bestEstimator.isDefined && gs.bestEstimator.get.isFitted)
    // cv_results frame shape
    val res = gs.cvResults(spark)
    assert(res.columns.toSet == Set("candidate", "params",
      "mean_fit_time", "mean_score_time",
      "split0_test_score", "split1_test_score", "split2_test_score",
      "mean_test_score", "std_test_score", "rank_test_score"))
    assert(res.count() == 3)
  }

  test("failed candidates get errorScore and do not win; all-fail raises") {
    val df = panel
    // shift param exists; use an invalid param name via a custom failing wrapper instead:
    // simulate failure with a pipeline whose copyWith rejects the key
    val gs = new GridSearch(pipe(df),
      Map("mu__shift" -> Seq(0.0), "mu__bogus" -> Seq(1)),
      scoring = Seq("neg_mean_squared_error"), labelCol = "y")
    assertThrows[IllegalStateException](gs.fit(df)) // every candidate fails
  }

  test("multimetric scoring: per-metric columns, named refit metric picks best") {
    val df = panel
    val gs = new GridSearch(pipe(df),
      Map("mu__shift" -> Seq(0.0, 5.0)),
      scoring = Seq("neg_mean_squared_error", "neg_mean_absolute_error"),
      labelCol = "y", refitMetric = Some("neg_mean_absolute_error"))
    gs.fit(df)
    val cols = gs.cvResults(spark).columns.toSet
    assert(cols.contains("mean_test_neg_mean_squared_error"))
    assert(cols.contains("rank_test_neg_mean_absolute_error"))
    assert(gs.bestParams == Map("mu__shift" -> 0.0))
    assert(gs.results.head.meanScore.keySet ==
      Set("neg_mean_squared_error", "neg_mean_absolute_error"))
  }

  test("named averaged scorers (f1_macro etc.) drive through search end to end") {
    // binary-ish multiclass: y in {0,1}, ThresholdClassifier prediction
    val rows = for (p <- 1 to 10; i <- 0 to 3) yield (p * 10 + i, p, (i / 2).toDouble, i.toDouble)
    val df = rows.toDF("id", "period", "y", "x")
    val cv = graft.cv.PanelSplit(df, "period", nSplits = 3, testSize = 1)
    val pipe = new SequentialCVPipeline(
      Seq("clf" -> est(new graft.ml.ThresholdClassifier()
        .setFeatureCol("x").setLabelCol("y"))), Seq(Some(cv)))
    val gs = new GridSearch(pipe, Map("clf__predictionCol" -> Seq("prediction")),
      scoring = Seq("f1_macro", "precision_weighted", "recall_micro"), labelCol = "y")
    gs.fit(df)
    val r = gs.results.head
    assert(r.splitScores.keySet == Set("f1_macro", "precision_weighted", "recall_micro"))
    assert(r.splitScores.values.forall(s => s.size == 3 && s.forall(v => v >= 0.0 && v <= 1.0)))
    // x = i, threshold = mean(i) = 1.5 -> pred = (i>1.5) = i/2 = y -> perfect scores
    assert(r.meanScore("recall_micro") == 1.0)
  }

  test("multimetric scoring reuses the cached candidate response (stage-count evidence)") {
    val df = panel.cache(); df.count()
    def stagesFor(scoring: Seq[String]): Int = {
      val counter = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          counter.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        new GridSearch(pipe(df), Map("mu__shift" -> Seq(0.0)),
          scoring = scoring, labelCol = "y", refit = false).fit(df)
        Thread.sleep(2000) // let the listener bus drain
      } finally spark.sparkContext.removeSparkListener(listener)
      counter.get
    }
    val one = stagesFor(Seq("neg_mean_squared_error"))
    val four = stagesFor(Seq("neg_mean_squared_error", "neg_mean_absolute_error",
      "neg_root_mean_squared_error", "neg_mean_absolute_percentage_error"))
    // without the per-candidate persist, 4 metrics would re-run the whole
    // per-fold transform per scorer (~4x the stages); with the cached
    // response the extra metrics add only their own aggregate/collect stages
    assert(four < one * 3,
      s"stage blowup suggests the response cache is gone: 1 metric -> $one stages, 4 -> $four")
  }

  test("error_score=raise fails fast with the candidate's error") {
    val df = panel
    val gs = new GridSearch(pipe(df),
      Map("mu__bogus" -> Seq(1)),
      scoring = Seq("neg_mean_squared_error"), labelCol = "y",
      raiseOnError = true)
    val e = intercept[IllegalStateException](gs.fit(df))
    assert(e.getMessage.contains("error_score=raise"))
    assert(e.getCause != null) // original failure preserved
  }

  test("clustering scorer (v_measure_score) drives a GridSearch over a clustering step") {
    // two label groups separated in feature space: nBins=2 clusters them
    // perfectly (v_measure 1), nBins=1 collapses everything (v_measure 0)
    val rows = for (p <- 1 to 10; i <- 0 to 3)
      yield (p * 10 + i, p, if (i < 2) 0.0 else 1.0, if (i < 2) i * 1.0 else 12.0 + i)
    val df = rows.toDF("id", "period", "label", "feature")
    val cv = PanelSplit(df, "period", nSplits = 3, testSize = 1)
    val pipeline = new SequentialCVPipeline(
      Seq("bin" -> est(new graft.ml.BinClusterer()
        .setFeatureCol("feature").setLabelCol("label"))), Seq(Some(cv)))
    val gs = new GridSearch(pipeline,
      Map("bin__nBins" -> Seq(1.0, 2.0)),
      scoring = Seq("v_measure_score"), labelCol = "label")
    gs.fit(df)
    assert(gs.bestParams == Map("bin__nBins" -> 2.0))
    val byBins = gs.results.map(r => r.params("bin__nBins") -> r.meanScore("v_measure_score")).toMap
    assert(math.abs(byBins(2.0) - 1.0) < 1e-9, s"separating binning should score 1: $byBins")
    assert(math.abs(byBins(1.0) - 0.0) < 1e-9, s"single cluster should score 0: $byBins")
    // cvResults carries the clustering metric's per-split and summary columns
    val cols = gs.cvResults(spark).columns.toSet
    assert(cols.contains("mean_test_score") && cols.contains("rank_test_score")
      && cols.contains("split0_test_score"))
  }

  test("custom callable scorer flows through search and cvResults") {
    import org.apache.spark.sql.functions._
    val df = panel
    // user-defined metric: mean absolute error capped at 2.0 per row
    val capped = graft.metrics.Metrics.MetricSpec(
      "capped_mae", greaterIsBetter = false,
      (l, p) => avg(least(abs(l - p), lit(2.0))))
    val gs = new GridSearch(pipe(df),
      Map("mu__shift" -> Seq(0.0, 100.0)),
      scoring = Seq("capped_mae", "neg_mean_squared_error"), labelCol = "y",
      extraScorers = Map("capped_mae" -> graft.metrics.Scorers.custom(capped)))
    gs.fit(df)
    // greaterIsBetter=false -> sign-flipped like neg_* scorers
    assert(gs.results.forall(_.meanScore("capped_mae") <= 0.0))
    // shift=100 saturates the cap: every |y - p| > 2 -> score exactly -2
    val shifted = gs.results.find(_.params("mu__shift") == 100.0).get
    assert(shifted.meanScore("capped_mae") == -2.0)
    val cols = gs.cvResults(spark).columns.toSet
    assert(cols.contains("mean_test_capped_mae") && cols.contains("rank_test_capped_mae"))
    assert(gs.bestParams == Map("mu__shift" -> 0.0))
  }

  test("RandomizedSearch samples continuous distributions deterministically") {
    val df = panel
    def run() = {
      val rs = new RandomizedSearch(pipe(df),
        Map("mu__shift" -> UniformDist(0.0, 10.0)), nIter = 4, seed = 7L,
        scoring = Seq("neg_mean_squared_error"), labelCol = "y")
      rs.fit(df); rs
    }
    val (a, b) = (run(), run())
    assert(a.results.size == 4)
    val draws = a.results.map(_.params("mu__shift").asInstanceOf[Double])
    assert(draws.forall(v => v >= 0.0 && v < 10.0))
    assert(draws.distinct.size == 4) // continuous draws — no accidental repeats
    assert(draws == b.results.map(_.params("mu__shift").asInstanceOf[Double])) // seeded
    // log-uniform and int draws stay in range too
    val rng = new scala.util.Random(1L)
    val lg = Seq.fill(100)(LogUniformDist(0.01, 100.0).sample(rng).asInstanceOf[Double])
    assert(lg.forall(v => v >= 0.01 && v < 100.0))
    val is = Seq.fill(100)(IntUniformDist(3, 7).sample(rng).asInstanceOf[Int])
    assert(is.forall(v => v >= 3 && v <= 7) && is.distinct.sorted == Seq(3, 4, 5, 6, 7))
  }

  test("RandomizedSearch: exhaustive when grid <= nIter, seeded subset otherwise") {
    val df = panel
    val rsAll = new RandomizedSearch(pipe(df),
      Map("mu__shift" -> Seq(0.0, 1.0)), nIter = 5, seed = 42L,
      scoring = Seq("neg_mean_squared_error"), labelCol = "y")
    rsAll.fit(df)
    assert(rsAll.results.size == 2)

    val rsSub = new RandomizedSearch(pipe(df),
      Map("mu__shift" -> (0 to 9).map(_.toDouble)), nIter = 3, seed = 42L,
      scoring = Seq("neg_mean_squared_error"), labelCol = "y")
    rsSub.fit(df)
    assert(rsSub.results.size == 3)
    // deterministic under the same seed
    val rsSub2 = new RandomizedSearch(pipe(df),
      Map("mu__shift" -> (0 to 9).map(_.toDouble)), nIter = 3, seed = 42L,
      scoring = Seq("neg_mean_squared_error"), labelCol = "y")
    rsSub2.fit(df)
    assert(rsSub.results.map(_.params) == rsSub2.results.map(_.params))
  }
}
