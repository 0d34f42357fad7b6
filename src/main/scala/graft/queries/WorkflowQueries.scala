package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.SequentialCVPipeline
import graft.search.GridSearch

/** Capstone workflow query: the reference's signature end-to-end flow
  * (notebook cells 7-18) at the oracle gate —
  *
  *   CV Imputer step (out-of-fold imputed feature, leak-free)
  *     → LinearRegression final step (no CV)
  *     → GridSearch over fitIntercept
  *     → cv_results
  *
  * Fully SQL-oracled: fold-wise train-mean imputation, then pooled OLS with
  * and without intercept in closed form, scored by -MSE, ranked.
  */
object WorkflowQueries extends QueryPack {

  import PanelQueries.{events, panelSplit, prelude}

  private def est(e: org.apache.spark.ml.Estimator[_ <: org.apache.spark.ml.Model[_]]) = e

  private def pipelineSearch(spark: SparkSession, dir: String): DataFrame = {
    // feature x: value with nulls at event_id % 7 == 0; target y: value * 0.5 + x-noise proxy
    val df = events(spark, dir)
      .withColumn("x_raw", when(col("event_id") % 7 === 0, lit(null)).otherwise(col("value")))
      .withColumn("y", col("value") * 0.5 + (col("event_id") % 10).cast("double"))
    val ps = panelSplit(df)

    val imputer = new org.apache.spark.ml.feature.Imputer()
      .setInputCol("x_raw").setOutputCol("x").setStrategy("mean")
    // assemble inside the pipeline after imputation via a no-CV assembler step
    val assembler = new AssemblerEstimator("x", "features")
    val lr = new org.apache.spark.ml.regression.LinearRegression()
      .setFeaturesCol("features").setLabelCol("y")
      .setSolver("normal").setRegParam(0.0)

    val pipe = new SequentialCVPipeline(
      Seq("impute" -> est(imputer), "vec" -> est(assembler), "lr" -> est(lr)),
      Seq(Some(ps), None, None))
    val gs = new GridSearch(pipe,
      Map("lr__fitIntercept" -> Seq(true, false)),
      scoring = Seq("neg_mean_squared_error"), labelCol = "y", refit = false)
    gs.fit(df)
    gs.cvResults(spark).select(
      col("candidate"), col("params"),
      round(col("split0_test_score"), 4).as("score"),
      col("rank_test_score"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pipeline_search" -> (pipelineSearch _),
  )

  def oracleSql: Map[String, String] = Map(
    "q_pipeline_search" ->
      s"""$prelude,
         |evy AS (SELECT ev.*, CASE WHEN ev.event_id % 7 = 0 THEN NULL ELSE ev.value END AS x_raw,
         |               ev.value * 0.5 + CAST(ev.event_id % 10 AS DOUBLE) AS y
         |        FROM ev),
         |imp AS (SELECT b.split AS fold, avg(evy.x_raw) AS mu
         |        FROM evy JOIN bounds b ON evy.pos < b.test_start GROUP BY b.split),
         |-- out-of-fold rows: each fold's TEST rows with fold-trained imputation
         |oof AS (SELECT evy.y, coalesce(evy.x_raw, imp.mu) AS x
         |        FROM evy JOIN bounds b ON evy.pos = b.test_start
         |        JOIN imp ON imp.fold = b.split),
         |s AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         |             sum(x * x) AS sxx, sum(x * y) AS sxy FROM oof),
         |fitsI AS (SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
         |                 sy / n - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx / n AS icept
         |          FROM s),
         |fitsN AS (SELECT sxy / sxx AS slope FROM s),
         |mseI AS (SELECT -avg(power(o.y - (f.icept + f.slope * o.x), 2)) AS score
         |         FROM oof o CROSS JOIN fitsI f),
         |mseN AS (SELECT -avg(power(o.y - (f.slope * o.x), 2)) AS score
         |         FROM oof o CROSS JOIN fitsN f),
         |-- grid order Seq(true, false) -> candidate 0 = intercept fit
         |cand AS (SELECT 0 AS candidate, 'lr__fitIntercept=true' AS params, score FROM mseI
         |         UNION ALL
         |         SELECT 1, 'lr__fitIntercept=false', score FROM mseN)
         |SELECT candidate, params, round(score, 4) AS score,
         |       CAST(rank() OVER (ORDER BY score DESC) AS INT) AS rank_test_score
         |FROM cand
         |""".stripMargin,
  )
}

/** Tiny stateless Estimator wrapping VectorAssembler so it can sit in a
  * SequentialCVPipeline step (which expects Estimators; VectorAssembler is a
  * Transformer).
  */
class AssemblerEstimator(inputCol: String, outputCol: String, override val uid: String)
    extends org.apache.spark.ml.Estimator[AssemblerModel] {
  def this(inputCol: String, outputCol: String) =
    this(inputCol, outputCol, org.apache.spark.ml.util.Identifiable.randomUID("assembler"))
  override def fit(ds: org.apache.spark.sql.Dataset[_]): AssemblerModel =
    new AssemblerModel(inputCol, outputCol, uid)
  override def copy(extra: org.apache.spark.ml.param.ParamMap): AssemblerEstimator =
    new AssemblerEstimator(inputCol, outputCol, uid)
  override def transformSchema(schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.types.StructType =
    schema
}

class AssemblerModel(inputCol: String, outputCol: String, override val uid: String)
    extends org.apache.spark.ml.Model[AssemblerModel] {
  override def transform(ds: org.apache.spark.sql.Dataset[_]): DataFrame =
    new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(Array(inputCol)).setOutputCol(outputCol)
      .transform(ds)
  override def copy(extra: org.apache.spark.ml.param.ParamMap): AssemblerModel =
    new AssemblerModel(inputCol, outputCol, uid)
  override def transformSchema(schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.types.StructType =
    schema
}
