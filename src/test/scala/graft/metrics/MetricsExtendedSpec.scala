package graft.metrics

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Hand-computed oracles for the round-2 registry additions: likelihood
  * ratios, D² family, the full clustering-metric family (incl. AMI),
  * top-k accuracy, multiclass OVR/OVO ROC-AUC, and jaccard/samples
  * averages — plus full-parity registry resolution against the reference's
  * 58 scorer names (`panelsplit/metrics.py:670-724`).
  */
class MetricsExtendedSpec extends SparkTestBase {
  private lazy val sp = spark
  import sp.implicits._

  private def score(metric: String, pairs: Seq[(Double, Double)]): Double = {
    val df = pairs.map { case (y, p) => (0, y, p) }.toDF("fold", "label", "prediction")
    Metrics.perFoldScoreSeq(df, metric, "label", "prediction").head
  }

  test("registry resolves all 58 reference scorer names") {
    val referenceNames = Seq(
      "explained_variance", "r2", "neg_max_error", "matthews_corrcoef",
      "neg_median_absolute_error", "neg_mean_absolute_error",
      "neg_mean_absolute_percentage_error", "neg_mean_squared_error",
      "neg_mean_squared_log_error", "neg_root_mean_squared_error",
      "neg_root_mean_squared_log_error", "neg_mean_poisson_deviance",
      "neg_mean_gamma_deviance", "d2_absolute_error_score", "d2_brier_score",
      "d2_log_loss_score", "accuracy", "top_k_accuracy", "roc_auc",
      "roc_auc_ovr", "roc_auc_ovo", "roc_auc_ovr_weighted",
      "roc_auc_ovo_weighted", "balanced_accuracy", "average_precision",
      "neg_log_loss", "neg_brier_score", "positive_likelihood_ratio",
      "neg_negative_likelihood_ratio", "adjusted_rand_score", "rand_score",
      "homogeneity_score", "completeness_score", "v_measure_score",
      "mutual_info_score", "adjusted_mutual_info_score",
      "normalized_mutual_info_score", "fowlkes_mallows_score") ++
      (for {
        stat <- Seq("precision", "recall", "f1", "jaccard")
        avg <- Seq("", "_macro", "_micro", "_samples", "_weighted")
      } yield s"$stat$avg")
    assert(referenceNames.size == 58)
    referenceNames.foreach(n => Scorers.get(n)) // throws on any miss
    // 58 reference names + the documented beyond-reference _approx scale
    // variants (bounded-memory percentile sketch, SCALE.md)
    val extras = Scorers.registry.keySet -- referenceNames
    assert(extras == Set("neg_median_absolute_error_approx", "d2_absolute_error_score_approx"),
      s"unexpected registry extras: $extras")
  }

  test("approx percentile metrics track the exact forms within sketch tolerance") {
    // 100k rows, skewed |error| distribution; percentile_approx(acc=10000)
    // has rank error <= n/acc = 10 ranks, so the value gap must be tiny
    val n = 100000
    val df = (0 until n).map { i =>
      val y = math.exp((i * 2654435761L % 1000) / 250.0) // lognormal-ish, span ~e^4
      (i % 3, y, y * (1.0 + ((i * 40503) % 200 - 100) / 1000.0))
    }.toDF("fold", "label", "prediction")
    val exact = Metrics.perFoldScoreSeq(df, "median_absolute_error", "label", "prediction")
    val approx = Metrics.perFoldScoreSeq(df, "median_absolute_error_approx", "label", "prediction")
    exact.zip(approx).foreach { case (e, a) =>
      assert(math.abs(e - a) <= 0.01 * math.abs(e) + 1e-9, s"medae exact=$e approx=$a")
    }
    val d2e = Metrics.d2AbsoluteError(df, "label", "prediction")
      .select("score").as[Double].collect()
    val d2a = Metrics.d2AbsoluteError(df, "label", "prediction", approx = true)
      .select("score").as[Double].collect()
    d2e.zip(d2a).foreach { case (e, a) =>
      assert(math.abs(e - a) <= 0.01 * math.abs(e) + 1e-6, s"d2 exact=$e approx=$a")
    }
  }

  test("pos_label=0 re-expresses binary scorers; hand oracle + AUC invariance") {
    // (label, prediction): pos_label=0 -> tp=2 (rows 3,4), fp=1 (row 2),
    // precision_0 = 2/3; default precision_1 = 1/2
    val hard = Seq((1.0, 1.0), (1.0, 0.0), (0.0, 0.0), (0.0, 0.0), (0.0, 1.0))
      .map { case (y, p) => (0, y, p) }.toDF("fold", "label", "prediction")
    val p1 = Scorers.get("precision").scoreTransformed(hard, "label").head
    val p0 = Scorers.get("precision").withPosLabel(0.0).scoreTransformed(hard, "label").head
    assert(math.abs(p1 - 0.5) < 1e-12)
    assert(math.abs(p0 - 2.0 / 3.0) < 1e-12)
    // ROC-AUC is invariant under (labels flipped, p -> 1-p): P(p1 > p0) is
    // the same event — the dispatch must implement exactly that transform
    val soft = Seq((1.0, 0.9), (1.0, 0.4), (0.0, 0.6), (0.0, 0.1), (0.0, 0.2))
      .map { case (y, p) => (0, y, p) }.toDF("fold", "label", "probability")
    val auc1 = Scorers.get("roc_auc").scoreTransformed(soft, "label").head
    val auc0 = Scorers.get("roc_auc").withPosLabel(0.0).scoreTransformed(soft, "label").head
    assert(math.abs(auc1 - auc0) < 1e-12)
  }

  test("top_k_accuracy scorer takes k through scorer kwargs") {
    // class-2 always ranked 1st, true label in top-1 for rows 0-1 only,
    // top-3 for all
    val df = Seq(
      (0, 2.0, Array(0.1, 0.2, 0.7)),
      (0, 2.0, Array(0.2, 0.1, 0.7)),
      (0, 0.0, Array(0.3, 0.1, 0.6)), // label 0 ranked 2nd -> top-2
      (0, 1.0, Array(0.3, 0.1, 0.6))) // label 1 ranked 3rd -> top-3 only
      .toDF("fold", "label", "probabilities")
    def acc(k: Int) = Scorers.topKAccuracy(k).scoreTransformed(df, "label").head
    assert(math.abs(acc(1) - 0.5) < 1e-12)
    assert(math.abs(acc(2) - 0.75) < 1e-12)
    assert(math.abs(acc(3) - 1.0) < 1e-12)
    // registry default stays sklearn's k=2
    assert(math.abs(Scorers.get("top_k_accuracy").scoreTransformed(df, "label").head - 0.75) < 1e-12)
  }

  test("custom scorer overrides a name-colliding registry builtin") {
    // a user MetricSpec named 'roc_auc' that just averages the response must
    // run INSTEAD of the builtin rank AUC (check()'s extra-first contract)
    val df = Seq((0, 1.0, 0.8), (0, 0.0, 0.4)).toDF("fold", "label", "probability")
    val impostor = Metrics.MetricSpec("roc_auc", greaterIsBetter = true, (_, p) => avg(p))
    val got = Scorers.custom(impostor, responseCol = "probability")
      .scoreTransformed(df, "label").head
    assert(math.abs(got - 0.6) < 1e-12, s"builtin AUC ran instead of the custom aggregate: $got")
  }

  test("class likelihood ratios (hand-computed confusion matrix)") {
    // tp=2 fp=1 fn=1 tn=2 -> tpr=2/3, fpr=1/3, LR+ = 2; fnr=1/3, tnr=2/3, LR- = 0.5
    val pairs = Seq((1.0, 1.0), (1.0, 1.0), (1.0, 0.0), (0.0, 1.0), (0.0, 0.0), (0.0, 0.0))
    assert(math.abs(score("positive_likelihood_ratio", pairs) - 2.0) < 1e-12)
    assert(math.abs(score("negative_likelihood_ratio", pairs) - 0.5) < 1e-12)
    // degenerate: fp=0 -> undefined -> 1.0 (replace_undefined_by)
    val clean = Seq((1.0, 1.0), (0.0, 0.0))
    assert(score("positive_likelihood_ratio", clean) == 1.0)
  }

  test("d2_brier and d2_log_loss against direct formulas") {
    val pairs = Seq((1.0, 0.9), (0.0, 0.2), (1.0, 0.7), (0.0, 0.4))
    val ys = pairs.map(_._1); val ps = pairs.map(_._2)
    val n = ys.size
    val q = ys.sum / n
    val brier = pairs.map { case (y, p) => math.pow(y - p, 2) }.sum / n
    val varPop = ys.map(y => math.pow(y - q, 2)).sum / n
    assert(math.abs(score("d2_brier_score", pairs) - (1 - brier / varPop)) < 1e-12)
    val ll = -pairs.map { case (y, p) => y * math.log(p) + (1 - y) * math.log(1 - p) }.sum / n
    val h = -(q * math.log(q) + (1 - q) * math.log(1 - q))
    assert(math.abs(score("d2_log_loss_score", pairs) - (1 - ll / h)) < 1e-9)
  }

  test("d2_absolute_error against direct formula (fold median null model)") {
    val df = Seq((0, 1.0, 2.0), (0, 3.0, 2.0), (0, 5.0, 4.0), (0, 7.0, 8.0))
      .toDF("fold", "y", "p")
    val got = Metrics.d2AbsoluteError(df, "y", "p").head().getDouble(1)
    val med = 4.0 // median of 1,3,5,7
    val num = Seq(1.0 - 2.0, 3.0 - 2.0, 5.0 - 4.0, 7.0 - 8.0).map(math.abs).sum
    val den = Seq(1.0, 3.0, 5.0, 7.0).map(y => math.abs(y - med)).sum
    assert(math.abs(got - (1 - num / den)) < 1e-12)
  }

  test("clustering family on a hand contingency") {
    // labels: 0,0,1,1 ; clusters: 0,1,0,1 -> independent-ish table, all nij=1
    val indep = Seq((0, 0, 0), (0, 0, 1), (0, 1, 0), (0, 1, 1)).toDF("fold", "label", "cluster")
    val m = Metrics.clusteringMetrics(indep, "label", "cluster").head()
    // n=4: C(4,2)=6 pairs; tk=0 (all nij=1), pk=qk=2*C(2,2)=2
    assert(math.abs(m.getAs[Double]("rand") - (6.0 + 0 - 2 - 2) / 6.0) < 1e-12)
    assert(math.abs(m.getAs[Double]("mutual_info")) < 1e-12) // independent
    assert(math.abs(m.getAs[Double]("homogeneity")) < 1e-12)
    assert(math.abs(m.getAs[Double]("completeness")) < 1e-12)
    assert(m.getAs[Double]("v_measure") == 0.0)
    assert(m.getAs[Double]("fowlkes_mallows") == 0.0) // tk = 0

    // perfect match: labels == clusters
    val perfect = Seq((0, 0, 0), (0, 0, 0), (0, 1, 1), (0, 1, 1)).toDF("fold", "label", "cluster")
    val pm = Metrics.clusteringMetrics(perfect, "label", "cluster").head()
    assert(math.abs(pm.getAs[Double]("rand") - 1.0) < 1e-12)
    assert(math.abs(pm.getAs[Double]("homogeneity") - 1.0) < 1e-12)
    assert(math.abs(pm.getAs[Double]("completeness") - 1.0) < 1e-12)
    assert(math.abs(pm.getAs[Double]("v_measure") - 1.0) < 1e-12)
    assert(math.abs(pm.getAs[Double]("fowlkes_mallows") - 1.0) < 1e-12)
    assert(math.abs(pm.getAs[Double]("mutual_info") - math.log(2.0)) < 1e-12) // H = ln 2
  }

  test("adjusted mutual info on empty input returns an empty frame, not NPE") {
    val empty = Seq.empty[(Int, Double, Double)].toDF("fold", "label", "prediction")
    assert(Metrics.adjustedMutualInfo(empty, "label", "prediction").count() == 0)
  }

  test("adjusted mutual info: perfect labeling scores 1, independent scores ~0") {
    val perfect = Seq((0, 0, 0), (0, 0, 0), (0, 1, 1), (0, 1, 1), (0, 2, 2), (0, 2, 2))
      .toDF("fold", "label", "cluster")
    val ami = Metrics.adjustedMutualInfo(perfect, "label", "cluster").head().getDouble(1)
    assert(math.abs(ami - 1.0) < 1e-9)
    // empirically independent 2×2 table (nij=2, ai=bj=4, n=8): MI=0, so
    // AMI = -EMI/(H̄-EMI); hand-computed EMI=0.079604 → AMI = -0.12974472...
    // (the chance correction makes independence NEGATIVE, unlike NMI's 0)
    val indep = Seq((0, 0, 0), (0, 0, 1), (0, 1, 0), (0, 1, 1),
      (0, 0, 0), (0, 0, 1), (0, 1, 0), (0, 1, 1)).toDF("fold", "label", "cluster")
    val amiI = Metrics.adjustedMutualInfo(indep, "label", "cluster").head().getDouble(1)
    assert(math.abs(amiI - (-0.12974472642510546)) < 1e-9)
  }

  test("top-k accuracy with ties resolves to the lower index") {
    // scores [0.5, 0.5, 0.2]: rank order = idx0, idx1, idx2
    val df = Seq(
      (0, 0, Seq(0.5, 0.5, 0.2)), // label 0 at position 0 -> top-1 hit
      (0, 1, Seq(0.5, 0.5, 0.2)), // label 1 at position 1 -> top-1 miss, top-2 hit
      (0, 2, Seq(0.1, 0.3, 0.9))  // label 2 at position 0 -> top-1 hit
    ).toDF("fold", "label", "scores")
    assert(Metrics.topKAccuracy(df, "label", "scores", 1).head().getDouble(1) === 2.0 / 3)
    assert(Metrics.topKAccuracy(df, "label", "scores", 2).head().getDouble(1) === 1.0)
  }

  test("OVR ROC-AUC on 2 classes with complementary scores equals binary AUC") {
    val rows = Seq(
      (0, 1.0, 0.9), (0, 0.0, 0.4), (0, 1.0, 0.7), (0, 0.0, 0.6), (0, 1.0, 0.2))
    val bin = rows.toDF("fold", "label", "probability")
    val binAuc = Metrics.rocAuc(bin, "label", "probability").head().getDouble(1)
    val arr = rows.map { case (f, y, p) => (f, y.toInt, Seq(1 - p, p)) }
      .toDF("fold", "label", "scores")
    val ovr = Metrics.rocAucOvr(arr, "label", "scores", weighted = false).head().getDouble(1)
    val ovrW = Metrics.rocAucOvr(arr, "label", "scores", weighted = true).head().getDouble(1)
    val ovo = Metrics.rocAucOvo(arr, "label", "scores", weighted = false).head().getDouble(1)
    assert(math.abs(ovr - binAuc) < 1e-12)  // AUC(class1)=AUC(class0) by symmetry
    assert(math.abs(ovo - binAuc) < 1e-12)
    // weighted differs from macro only under class imbalance of the AUCs
    assert(ovrW >= 0 && ovrW <= 1)
  }

  test("OVO ROC-AUC raises on ragged scores arrays instead of dropping pairs") {
    // under non-ANSI Spark element_at past the end returns NULL — the arity
    // guard must fail loudly, not let the short row's pairs vanish
    val ragged = Seq(
      (0, 0, Seq(0.7, 0.2, 0.1)), (0, 1, Seq(0.1, 0.8, 0.1)),
      (0, 2, Seq(0.2, 0.2, 0.6)), (0, 1, Seq(0.4, 0.6)))
      .toDF("fold", "label", "scores")
    val ex = intercept[Exception] {
      Metrics.rocAucOvo(ragged, "label", "scores", weighted = false).collect()
    }
    // two loud paths can win the race: the arity guard (ragged), or — with
    // ANSI on, the Spark-4 default — the unguarded element_at's own bounds
    // error; the guard exists for ANSI-off deployments where element_at
    // would return NULL silently
    assert(ex.getMessage.contains("ragged")
      || ex.getMessage.contains("INVALID_ARRAY_INDEX"),
      s"expected a loud arity failure, got: ${ex.getMessage.take(200)}")
  }

  test("response dispatch: decision_function preferred, predict_proba fallback") {
    val probOnly = Seq((0, 1.0, 0.9), (0, 0.0, 0.3), (0, 1.0, 0.6), (0, 0.0, 0.8))
      .toDF("fold", "label", "probability")
    val auc = Scorers.get("roc_auc")
    val viaProb = auc.scoreTransformed(probOnly, "label")
    // add a decision column (monotone in probability): preferred, same AUC
    val withDec = probOnly.withColumn("decision", col("probability") * 7 - 2)
    val viaDec = auc.scoreTransformed(withDec, "label")
    assert(viaProb == viaDec)
    // the decision column genuinely drives the ranking: an ANTI-monotone
    // decision column flips the AUC
    val antiDec = probOnly.withColumn("decision", -col("probability"))
    val viaAnti = auc.scoreTransformed(antiDec, "label")
    assert(math.abs(viaAnti.head - (1.0 - viaProb.head)) < 1e-12)
    // no usable response column -> descriptive error
    val none = probOnly.drop("probability")
    val e = intercept[IllegalArgumentException](auc.scoreTransformed(none, "label"))
    assert(e.getMessage.contains("decision"))
    // ThresholdClassifier emits the full response surface incl. log_probability
    val df = Seq((1, 1.0, 0.0), (2, 5.0, 1.0)).toDF("id", "x", "y")
    val m = new graft.ml.ThresholdClassifier().setFeatureCol("x").setLabelCol("y").fit(df)
    val out = m.transform(df)
    assert(Set("prediction", "probability", "decision", "log_probability")
      .subsetOf(out.columns.toSet))
    val row = out.filter(col("id") === 2).head()
    assert(math.abs(row.getAs[Double]("log_probability")
      - math.log(row.getAs[Double]("probability"))) < 1e-12)
  }

  test("sample-weighted metrics against hand-computed values") {
    val df = Seq(
      (0, 1.0, 2.0, 1.0), (0, 3.0, 2.0, 3.0), (0, 5.0, 4.0, 2.0)
    ).toDF("fold", "label", "prediction", "w")
    val wmse = Metrics.perFoldScoresWeighted(df, "mean_squared_error",
      "label", "prediction", "w").head().getDouble(1)
    // (1*1 + 3*1 + 2*1) / 6 = 1.0
    assert(math.abs(wmse - 1.0) < 1e-12)
    val wmae = Metrics.perFoldScoresWeighted(df, "mean_absolute_error",
      "label", "prediction", "w").head().getDouble(1)
    assert(math.abs(wmae - 1.0) < 1e-12)
    // neg_* sign flip flows through
    val negW = Metrics.perFoldScoresWeighted(df, "neg_mean_squared_error",
      "label", "prediction", "w").head().getDouble(1)
    assert(negW == -wmse)

    // weighted confusion: rows (y,p,w): (1,1,2),(1,0,1),(0,1,1),(0,0,4)
    val clf = Seq((0, 1.0, 1.0, 2.0), (0, 1.0, 0.0, 1.0), (0, 0.0, 1.0, 1.0), (0, 0.0, 0.0, 4.0))
      .toDF("fold", "label", "prediction", "w")
    def ws(m: String) = Metrics.perFoldScoresWeighted(clf, m, "label", "prediction", "w").head().getDouble(1)
    assert(math.abs(ws("accuracy") - 6.0 / 8) < 1e-12)
    assert(math.abs(ws("precision") - 2.0 / 3) < 1e-12) // wtp=2, wfp=1
    assert(math.abs(ws("recall") - 2.0 / 3) < 1e-12)    // wfn=1
    assert(math.abs(ws("f1") - 2.0 * 2 / (2 * 2 + 1 + 1)) < 1e-12)
    // unsupported weighted forms fail loudly
    assertThrows[IllegalArgumentException](ws("median_absolute_error"))
    assertThrows[IllegalArgumentException](ws("r2"))
  }

  test("jaccard averages and samples average") {
    // 3-class: labels 0,0,1,2 preds 0,1,1,1
    val df = Seq((0, 0, 0), (0, 0, 1), (0, 1, 1), (0, 2, 1)).toDF("fold", "label", "prediction")
    val macroRow = Metrics.multiclassScores(df, "label", "prediction", "macro").head()
    // per class jaccard: c0: tp=1, pred=1, supp=2 -> 1/2; c1: tp=1 pred=3 supp=1 -> 1/3; c2: 0
    assert(math.abs(macroRow.getAs[Double]("jaccard") - (0.5 + 1.0 / 3) / 3) < 1e-12)
    val micro = Metrics.multiclassScores(df, "label", "prediction", "micro").head()
    // micro jaccard: sum tp=2, sum pred=4, sum supp=4 -> 2/6
    assert(math.abs(micro.getAs[Double]("jaccard") - 2.0 / 6) < 1e-12)
    val samples = Metrics.multiclassScores(df, "label", "prediction", "samples").head()
    assert(samples.getAs[Double]("precision") == 0.5) // accuracy
    assert(samples.getAs[Double]("jaccard") == 0.5)
  }
}
