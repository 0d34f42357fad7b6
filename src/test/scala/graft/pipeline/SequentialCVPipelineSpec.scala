package graft.pipeline

import graft.SparkTestBase
import graft.cv.PanelSplit
import graft.ml.{IdentityRegressor, MeanRegressor}
import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.sql.functions._

class SequentialCVPipelineSpec extends SparkTestBase {
  private lazy val sp = spark
  import sp.implicits._

  private def est(e: Estimator[_ <: Model[_]]): Estimator[_ <: Model[_]] = e

  // 25 periods x 4 rows, y = row id — the identity-alignment oracle
  // (reference tests/test_pipeline.py:224-255)
  private def identityPanel = {
    val rows = for (p <- 1 to 25; i <- 0 to 3) yield ((p - 1) * 4 + i, p, ((p - 1) * 4 + i).toDouble)
    rows.toDF("id", "period", "y")
  }

  test("out-of-fold identity: each test row gets its own value back (test_indices_aligned analog)") {
    val df = identityPanel
    val cv = PanelSplit(df, "period", nSplits = 5, testSize = 2)
    val pipe = new SequentialCVPipeline(
      Seq("ident" -> est(new IdentityRegressor().setFeatureCol("y"))),
      Seq(Some(cv)))
    pipe.fit(df)
    val out = pipe.transform(df).select("id", "y", "prediction", "fold")
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getInt(3)))
    // rows in test folds: last 10 periods (5 folds x 2)
    assert(out.length == 40)
    out.foreach { case (_, y, pred, _) => assert(pred == y) }
    // fold assignment: period 16-17 -> fold 0 ... 24-25 -> fold 4
    assert(out.map(_._4).distinct.sorted.toVector == Vector(0, 1, 2, 3, 4))
  }

  test("two-step pipeline: CV mean step feeds identity final step; out-of-fold means are leak-free") {
    val df = Seq(
      (1, 1, 1.0), (2, 1, 3.0),   // period 1: mean 2.0
      (3, 2, 5.0), (4, 2, 7.0),   // period 2: mean 6.0
      (5, 3, 9.0), (6, 3, 11.0),  // period 3
      (7, 4, 13.0), (8, 4, 15.0)  // period 4
    ).toDF("id", "period", "y")
    val cv = PanelSplit(df, "period", nSplits = 2, testSize = 1)
    val pipe = new SequentialCVPipeline(
      Seq(
        "mu" -> est(new MeanRegressor().setLabelCol("y").setPredictionCol("mu")),
        "out" -> est(new IdentityRegressor().setFeatureCol("mu"))),
      Seq(Some(cv), None))
    pipe.fit(df)
    val out = pipe.transform(df).select("id", "prediction")
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toMap
    // fold 0: train periods {1,2} mean = 4.0 -> test period 3 rows
    // fold 1: train periods {1,2,3} mean = 6.0 -> test period 4 rows
    assert(out == Map(5 -> 4.0, 6 -> 4.0, 7 -> 6.0, 8 -> 6.0))
  }

  test("score: per-fold for CV last step; single score when last step has no CV") {
    val df = identityPanel
    val cv = PanelSplit(df, "period", nSplits = 3, testSize = 1)
    val cvPipe = new SequentialCVPipeline(
      Seq("ident" -> est(new IdentityRegressor().setFeatureCol("y"))), Seq(Some(cv)))
    cvPipe.fit(df)
    val scores = cvPipe.score(df, "mean_squared_error", "y")
    assert(scores == Seq(0.0, 0.0, 0.0))

    val nocv = new SequentialCVPipeline(
      Seq("ident" -> est(new IdentityRegressor().setFeatureCol("y"))), Seq(None))
    nocv.fit(df)
    assert(nocv.score(df, "mean_squared_error", "y") == Seq(0.0))
    // neg scorer sign flip
    assert(nocv.score(df, "neg_mean_squared_error", "y") == Seq(-0.0) ||
      nocv.score(df, "neg_mean_squared_error", "y") == Seq(0.0))
  }

  test("passthrough steps are skipped (pipeline.py:686-719)") {
    val df = identityPanel
    val pipe = new SequentialCVPipeline(
      Seq("skip" -> null, "ident" -> est(new IdentityRegressor().setFeatureCol("y"))),
      Seq(None, None))
    pipe.fit(df)
    assert(pipe.transform(df).select("prediction").as[Double].collect().toSet ==
      df.select("y").as[Double].collect().toSet)
  }

  test("save/load round-trips structure and fitted state (versioned directory)") {
    val df = identityPanel
    val cv = PanelSplit(df, "period", nSplits = 3, testSize = 1)
    val pipe = new SequentialCVPipeline(
      Seq("mu" -> est(new MeanRegressor().setLabelCol("y"))), Seq(Some(cv)))
    pipe.fit(df)
    val before = pipe.transform(df).select("id", "prediction")
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toMap
    val path = new java.io.File(sys.props("java.io.tmpdir"), s"graft_pipe_${System.nanoTime()}").getPath
    pipe.save(path)
    // versioned layout: a manifest + per-stage MLWritable dirs, NOT a blob
    assert(new java.io.File(path, "manifest.json").isFile)
    assert(new java.io.File(path, "step0/fold0/ml/metadata.json").isFile)
    val loaded = SequentialCVPipeline.load(path)
    assert(loaded.isFitted && loaded.nScoreSplits == 3)
    val after = loaded.transform(df).select("id", "prediction")
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toMap
    assert(before == after)
  }

  test("save/load delegates to spark.ml MLWritable stages (LinearRegression)") {
    val df = identityPanel
      .withColumn("features",
        org.apache.spark.ml.functions.array_to_vector(array(col("y"))))
    val cv = PanelSplit(df, "period", nSplits = 3, testSize = 1)
    val lr = new org.apache.spark.ml.regression.LinearRegression()
      .setFeaturesCol("features").setLabelCol("y").setSolver("normal").setRegParam(0.0)
    val pipe = new SequentialCVPipeline(
      Seq("lr" -> est(lr)), Seq(Some(cv)))
    pipe.fit(df)
    val before = pipe.transform(df).select("id", "prediction")
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toMap
    val path = new java.io.File(sys.props("java.io.tmpdir"), s"graft_pipe_lr_${System.nanoTime()}").getPath
    pipe.save(path)
    // the fold models are stock spark.ml LinearRegressionModel saves
    assert(new java.io.File(path, "step0/fold0/ml/metadata").exists)
    val loaded = SequentialCVPipeline.load(path)
    val after = loaded.transform(df).select("id", "prediction")
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toMap
    assert(before == after)
  }

  test("round-2 fixture pipeline loads (cross-version durability)") {
    val fixture = new java.io.File("src/test/resources/fixtures/pipeline_v1")
    assume(fixture.isDirectory, "fixture not yet generated")
    val loaded = SequentialCVPipeline.load(fixture.getPath)
    assert(loaded.isFitted && loaded.nScoreSplits == 3)
    // the fixture was fitted on identityPanel; its per-fold means are fixed
    val out = loaded.transform(identityPanel).select("id", "prediction")
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toMap
    assert(out.nonEmpty)
    // fixture cv: nSplits=3, testSize=1 over periods 1..25 → fold 0 trains
    // on periods 1..22 and tests period 23; spot-check its fitted mean
    val expected = identityPanel.filter(col("period") <= 22)
      .agg(avg(col("y"))).head().getDouble(0)
    val foldTestIds = identityPanel.filter(col("period") === 23)
      .select("id").as[Int].collect()
    foldTestIds.foreach { id => assert(math.abs(out(id) - expected) < 1e-9) }
  }

  test("copyWith applies step__param overrides to the right step only") {
    val pipe = new SequentialCVPipeline(
      Seq("mu" -> est(new MeanRegressor().setLabelCol("y"))), Seq(None))
    val shifted = pipe.copyWith(Map("mu__shift" -> 5.0))
    val df = Seq((1, 1, 2.0), (2, 2, 4.0)).toDF("id", "period", "y")
    shifted.fit(df)
    val preds = shifted.transform(df).select("prediction").as[Double].collect()
    assert(preds.forall(_ == 8.0)) // mean 3 + shift 5
    assertThrows[IllegalArgumentException](pipe.copyWith(Map("mu__nope" -> 1)).fit(df))
  }
}
