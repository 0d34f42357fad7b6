package graft.cv

import graft.SparkTestBase
import graft.ml.MeanRegressor
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.sql.functions._

class CrossValSpec extends SparkTestBase {
  private lazy val sp = spark
  import sp.implicits._

  private def panel = {
    val rows = for (p <- 1 to 8; i <- 0 to 3) yield (p * 10 + i, p, (p + i).toDouble, 1.0 + i)
    rows.toDF("id", "period", "y", "w")
  }

  test("out-of-fold predict: each test row predicted by its own fold's model only") {
    val df = panel
    val cv = PanelSplit(df, "period", nSplits = 3, testSize = 1)
    val (preds, models) = CrossVal.crossValFitPredict(
      new MeanRegressor().setLabelCol("y"), df, cv, labelCol = "y")
    assert(models.size == 3)
    val got = preds.select("period", "fold", "prediction")
      .distinct().as[(Int, Int, Double)].collect().sortBy(_._1)
    // fold i tests period 6+i, train mean = mean(p + i) over p in 1..5+i, i in 0..3
    def trainMean(upTo: Int) = (1 to upTo).flatMap(p => (0 to 3).map(i => (p + i).toDouble)).sum / (upTo * 4)
    assert(got.map(_._1).toSeq == Seq(6, 7, 8))
    got.foreach { case (period, fold, pred) =>
      assert(period == 6 + fold)
      assert(math.abs(pred - trainMean(period - 1)) < 1e-12)
    }
  }

  test("returnGroup=train predicts each fold's train rows with that fold's model") {
    val df = panel
    val cv = PanelSplit(df, "period", nSplits = 2, testSize = 1)
    val models = CrossVal.crossValFit(new MeanRegressor().setLabelCol("y"), df, cv, "y")
    val trainPreds = CrossVal.crossValPredict(models, df, cv, returnGroup = "train")
    // fold 0 train = periods 1..6 (24 rows), fold 1 train = periods 1..7 (28)
    val counts = trainPreds.groupBy("fold").count().as[(Int, Long)].collect().toMap
    assert(counts == Map(0 -> 24L, 1 -> 28L))
  }

  test("weightCol set only when the estimator declares it (application.py:130-137 capability mirror)") {
    // y nonlinear in the feature so per-group means are NOT collinear —
    // otherwise weighted and unweighted OLS coincide exactly
    val wpanel = (for (p <- 1 to 8; i <- 0 to 3)
      yield (p * 10 + i, p, (p + i * i).toDouble, 1.0 + i)).toDF("id", "period", "y", "w")
    val df = new VectorAssembler().setInputCols(Array("w")).setOutputCol("features")
      .transform(wpanel)
    val cv = PanelSplit(df, "period", nSplits = 2, testSize = 1)
    // LinearRegression HAS weightCol: weighted fit must differ from unweighted
    val lr = new LinearRegression().setFeaturesCol("features").setLabelCol("y")
      .setSolver("normal").setRegParam(0.0)
    val unweighted = CrossVal.crossValFit(lr, df, cv, "y")
    val weighted = CrossVal.crossValFit(lr, df, cv, "y", weightCol = Some("w"))
    def coef(t: org.apache.spark.ml.Transformer) =
      t.asInstanceOf[org.apache.spark.ml.regression.LinearRegressionModel].coefficients(0)
    assert(math.abs(coef(weighted.head) - coef(unweighted.head)) > 1e-9)
    // MeanRegressor has NO weightCol param: silently ignored, no crash
    val m = CrossVal.crossValFit(new MeanRegressor().setLabelCol("y"), df, cv, "y",
      weightCol = Some("w"))
    assert(m.size == 2)
  }

  test("parallel == serial (tests/test_cross_validation.py:51-80 invariant)") {
    val df = panel
    val cv = PanelSplit(df, "period", nSplits = 3, testSize = 1)
    val est = new MeanRegressor().setLabelCol("y")
    val serial = CrossVal.crossValFitPredict(est, df, cv, "y", parallelism = 1)._1
    val parallel = CrossVal.crossValFitPredict(est, df, cv, "y", parallelism = 4)._1
    val s = serial.select("id", "prediction").as[(Int, Double)].collect().sortBy(_._1).toSeq
    val p = parallel.select("id", "prediction").as[(Int, Double)].collect().sortBy(_._1).toSeq
    assert(s == p)
  }

  test("classesUnion: distinct union of train-side labels, sorted") {
    val df = Seq((1, 1, "b"), (2, 1, "a"), (3, 2, "c"), (4, 3, "a")).toDF("id", "period", "y")
    val cv = PanelSplit(df, "period", nSplits = 2, testSize = 1)
    // train union = periods 1,2 -> labels {a, b, c}
    assert(CrossVal.classesUnion(df, cv, "y") == Seq("a", "b", "c"))
  }

  test("dropNaInY filters only train-side nulls before fit") {
    val df = Seq((1, 1, Some(2.0)), (2, 1, None), (3, 2, Some(4.0)), (4, 3, Some(6.0)))
      .toDF("id", "period", "y")
    val cv = PanelSplit(df, "period", nSplits = 2, testSize = 1)
    val models = CrossVal.crossValFit(new MeanRegressor().setLabelCol("y"), df, cv, "y",
      dropNaInY = true)
    // fold 0 train = period 1 -> y = [2.0, null] -> mean of non-null = 2.0
    assert(models.head.asInstanceOf[graft.ml.MeanRegressorModel].mean == 2.0)
  }
}
