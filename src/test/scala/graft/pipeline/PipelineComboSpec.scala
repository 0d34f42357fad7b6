package graft.pipeline

import graft.SparkTestBase
import graft.cv.PanelSplit
import graft.ml.{IdentityRegressor, MeanRegressor, ThresholdClassifier}
import org.apache.spark.ml.{Estimator, Model}

/** Parametrized cv_steps × returnGroup sweep — the analog of the
  * reference's `tests/test_sequentialcvpipeline_indices.py:22-129` config
  * grid: every combination must fit, transform, and score without error,
  * and out-of-fold identity must hold wherever the final step is the
  * identity regressor.
  */
class PipelineComboSpec extends SparkTestBase {
  private lazy val sp = spark
  import sp.implicits._

  private def est(e: Estimator[_ <: Model[_]]): Estimator[_ <: Model[_]] = e

  private def panel = {
    val rows = for (p <- 1 to 8; i <- 0 to 2) yield (p * 10 + i, p, (p + i).toDouble)
    rows.toDF("id", "period", "y")
  }

  private def cvOf(df: org.apache.spark.sql.DataFrame) =
    PanelSplit(df, "period", nSplits = 3, testSize = 1)

  for {
    cv1 <- Seq(true, false)
    cv2 <- Seq(true, false)
    rg <- Seq("test", "train")
  } test(s"combo cv1=$cv1 cv2=$cv2 returnGroup=$rg fits, transforms, scores") {
    val df = panel
    val cv = cvOf(df)
    val pipe = new SequentialCVPipeline(
      Seq(
        "mu" -> est(new MeanRegressor().setLabelCol("y").setPredictionCol("mu")),
        "out" -> est(new IdentityRegressor().setFeatureCol("y"))),
      Seq(if (cv1) Some(cv) else None, if (cv2) Some(cv) else None),
      returnGroup = rg)
    pipe.fit(df)
    val out = pipe.transform(df)
    assert(out.count() > 0)
    // identity final step: every surviving row predicts its own y
    assert(out.filter(org.apache.spark.sql.functions.col("prediction") =!=
      org.apache.spark.sql.functions.col("y")).count() == 0)
    val scores = pipe.score(df, "mean_squared_error", "y")
    assert(scores.size == (if (cv2) 3 else 1))
    assert(scores.forall(_ == 0.0))
  }

  test("classifier final step with CV scores per fold (clf pipeline analog)") {
    val rows = for (p <- 1 to 8; i <- 0 to 3) yield (p * 10 + i, p, (i / 2).toDouble, i.toDouble)
    val df = rows.toDF("id", "period", "y", "x")
    val cv = cvOf(df)
    val pipe = new SequentialCVPipeline(
      Seq("clf" -> est(new ThresholdClassifier().setFeatureCol("x").setLabelCol("y"))),
      Seq(Some(cv)))
    pipe.fit(df)
    val acc = pipe.score(df, "accuracy", "y")
    assert(acc == Seq(1.0, 1.0, 1.0)) // threshold mean(x)=1.5 separates y exactly
  }
}
