package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cv.CrossVal
import graft.metrics.Metrics
import graft.ml.ThresholdClassifier

/** Metric-registry queries (SURVEY §2.4 metric aggregations / §2.11 scoring):
  * per-fold scores of deterministic predictors over `events`, one row per
  * (fold, metric), oracled in SQL.
  *
  * Regression: prediction = per-fold train mean (MeanRegressor).
  * Classification: label = event_id % 2, prediction/probability from the
  * deterministic ThresholdClassifier (value > train mean of value).
  */
object MetricQueries extends QueryPack {

  import PanelQueries.{events, panelSplit, prelude}

  private def regressionPreds(spark: SparkSession, dir: String): DataFrame = {
    val df = events(spark, dir)
    val ps = panelSplit(df)
    val (preds, _) = CrossVal.crossValFitPredict(
      new graft.ml.MeanRegressor().setLabelCol("value"), df, ps, labelCol = "value")
    preds
  }

  private val regMetrics = Seq(
    "mean_squared_error", "root_mean_squared_error", "mean_absolute_error",
    "mean_absolute_percentage_error", "median_absolute_error", "r2",
    "explained_variance", "max_error")

  private def regressionScores(spark: SparkSession, dir: String): DataFrame = {
    val preds = regressionPreds(spark, dir).cache()
    regMetrics.map { m =>
      Metrics.perFoldScores(preds, m, "value", "prediction")
        .select(col("fold"), lit(m).as("metric"), round(col("score"), 6).as("score"))
    }.reduce(_ unionByName _)
  }

  private val clfMetrics = Seq(
    "accuracy", "balanced_accuracy", "precision", "recall", "f1", "jaccard",
    "matthews_corrcoef")

  private def classificationScores(spark: SparkSession, dir: String): DataFrame = {
    val df = events(spark, dir)
      .withColumn("label", (col("event_id") % 2).cast("double"))
      .cache()
    val ps = panelSplit(df)
    val est = new ThresholdClassifier().setFeatureCol("value").setLabelCol("label")
    val (preds, _) = CrossVal.crossValFitPredict(est, df, ps, labelCol = "label")
    val cached = preds.cache()
    clfMetrics.map { m =>
      Metrics.perFoldScores(cached, m, "label", "prediction")
        .select(col("fold"), lit(m).as("metric"), round(col("score"), 6).as("score"))
    }.reduce(_ unionByName _)
  }

  /** ROC-AUC of a deterministic score (value, scaled) against label =
    * event_id % 2, per fold over test rows — exercises the rank-statistic
    * window path.
    */
  private def aucScores(spark: SparkSession, dir: String): DataFrame = {
    val df = events(spark, dir)
      .withColumn("label", (col("event_id") % 2).cast("double"))
    val ps = panelSplit(df)
    // fold membership for test rows only, tagged
    val folds = ps.folds.map { f =>
      df.filter(f.testPredicate(ps.periodsCol, None)).withColumn("fold", lit(f.index))
    }.reduce(_ unionByName _)
    Metrics.rocAuc(folds, "label", "value")
      .select(col("fold"), round(col("score"), 6).as("score"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_metrics_regression" -> (regressionScores _),
    "q_metrics_classification" -> (classificationScores _),
    "q_metric_roc_auc" -> (aucScores _),
  )

  def oracleSql: Map[String, String] = Map(
    "q_metrics_regression" ->
      s"""$prelude,
         |train AS (SELECT b.split AS fold, avg(ev.value) AS mu
         |          FROM ev JOIN bounds b ON ev.pos < b.test_start GROUP BY b.split),
         |test AS (SELECT b.split AS fold, ev.value AS y, tr.mu AS p
         |         FROM ev JOIN bounds b ON ev.pos = b.test_start
         |         JOIN train tr ON tr.fold = b.split),
         |m AS (SELECT fold,
         |        avg(power(y - p, 2)) AS mse,
         |        sqrt(avg(power(y - p, 2))) AS rmse,
         |        avg(abs(y - p)) AS mae,
         |        avg(abs(y - p) / greatest(abs(y), 1e-15)) AS mape,
         |        median(abs(y - p)) AS medae,
         |        1 - avg(power(y - p, 2)) / var_pop(y) AS r2,
         |        1 - var_pop(y - p) / var_pop(y) AS ev_score,
         |        max(abs(y - p)) AS maxerr
         |      FROM test GROUP BY fold)
         |SELECT fold, metric, round(score, 6) AS score FROM (
         |  SELECT fold, 'mean_squared_error' AS metric, mse AS score FROM m
         |  UNION ALL SELECT fold, 'root_mean_squared_error', rmse FROM m
         |  UNION ALL SELECT fold, 'mean_absolute_error', mae FROM m
         |  UNION ALL SELECT fold, 'mean_absolute_percentage_error', mape FROM m
         |  UNION ALL SELECT fold, 'median_absolute_error', medae FROM m
         |  UNION ALL SELECT fold, 'r2', r2 FROM m
         |  UNION ALL SELECT fold, 'explained_variance', ev_score FROM m
         |  UNION ALL SELECT fold, 'max_error', maxerr FROM m)
         |""".stripMargin,
    "q_metrics_classification" ->
      s"""$prelude,
         |train AS (SELECT b.split AS fold, avg(ev.value) AS thr
         |          FROM ev JOIN bounds b ON ev.pos < b.test_start GROUP BY b.split),
         |test AS (SELECT b.split AS fold,
         |                CAST(ev.event_id % 2 AS DOUBLE) AS y,
         |                CASE WHEN ev.value > tr.thr THEN 1.0 ELSE 0.0 END AS p
         |         FROM ev JOIN bounds b ON ev.pos = b.test_start
         |         JOIN train tr ON tr.fold = b.split),
         |cm AS (SELECT fold,
         |         CAST(sum(CASE WHEN y = 1 AND p = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS tp,
         |         CAST(sum(CASE WHEN y = 0 AND p = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS fp,
         |         CAST(sum(CASE WHEN y = 1 AND p = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS fn,
         |         CAST(sum(CASE WHEN y = 0 AND p = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS tn
         |       FROM test GROUP BY fold)
         |SELECT fold, metric, round(score, 6) AS score FROM (
         |  SELECT fold, 'accuracy' AS metric, (tp + tn) / (tp + fp + fn + tn) AS score FROM cm
         |  UNION ALL SELECT fold, 'balanced_accuracy', (tp / (tp + fn) + tn / (tn + fp)) / 2 FROM cm
         |  UNION ALL SELECT fold, 'precision', CASE WHEN tp + fp = 0 THEN 0 ELSE tp / (tp + fp) END FROM cm
         |  UNION ALL SELECT fold, 'recall', CASE WHEN tp + fn = 0 THEN 0 ELSE tp / (tp + fn) END FROM cm
         |  UNION ALL SELECT fold, 'f1', CASE WHEN 2*tp + fp + fn = 0 THEN 0 ELSE 2*tp / (2*tp + fp + fn) END FROM cm
         |  UNION ALL SELECT fold, 'jaccard', CASE WHEN tp + fp + fn = 0 THEN 0 ELSE tp / (tp + fp + fn) END FROM cm
         |  UNION ALL SELECT fold, 'matthews_corrcoef',
         |    CASE WHEN (tp+fp)*(tp+fn)*(tn+fp)*(tn+fn) = 0 THEN 0
         |         ELSE (tp*tn - fp*fn) / sqrt((tp+fp)*(tp+fn)*(tn+fp)*(tn+fn)) END FROM cm)
         |""".stripMargin,
    "q_metric_roc_auc" ->
      s"""$prelude,
         |test AS (SELECT b.split AS fold, CAST(ev.event_id % 2 AS DOUBLE) AS y, ev.value AS s
         |         FROM ev JOIN bounds b ON ev.pos = b.test_start),
         |ranked AS (SELECT fold, y,
         |                  rank() OVER (PARTITION BY fold ORDER BY s) AS r_lo,
         |                  count(*) OVER (PARTITION BY fold, s) AS cnt
         |           FROM test)
         |SELECT fold, round((sum(CASE WHEN y = 1 THEN r_lo + (cnt - 1) / 2.0 END)
         |        - sum(CASE WHEN y = 1 THEN 1.0 ELSE 0 END) * (sum(CASE WHEN y = 1 THEN 1.0 ELSE 0 END) + 1) / 2.0)
         |       / (sum(CASE WHEN y = 1 THEN 1.0 ELSE 0 END) * sum(CASE WHEN y <> 1 THEN 1.0 ELSE 0 END)), 6) AS score
         |FROM ranked GROUP BY fold
         |""".stripMargin,
  )
}
