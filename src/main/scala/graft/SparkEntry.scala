package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.cv.{CrossVal, PanelSplit}
import graft.metrics.Metrics
import graft.ml.MeanRegressor

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every `queries` entry is an operator from SURVEY §2 realized Spark-first;
  * each has a DuckDB-equivalent `oracleSql` (same column names, periods cast
  * to DATE, floats rounded) for the driver's hash compare at sf0.01.
  */
object SparkEntry {

  /** events with a month period column, the canonical panel fixture
    * (FIXTURES.md §6): period = date_trunc('day', ts) cast to date.
    */
  private def events(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.events(spark, dir)
      .withColumn("period", to_date(date_trunc("day", col("ts"))))

  /** Flagship query on sf=0.001; driver smoke-checks rows>0: expanding-window
    * panel CV of a mean regressor over monthly events, per-fold MSE.
    */
  def entry(spark: SparkSession): DataFrame =
    cvMse(spark, "/root/testdata/sf0.001")

  private val N_SPLITS = 3

  private def panelSplit(df: DataFrame): PanelSplit =
    PanelSplit(df, "period", nSplits = N_SPLITS, testSize = 1)

  /** Fold planning output as a DataFrame: (split, role, period). */
  private def foldPeriods(spark: SparkSession, dir: String): DataFrame = {
    val df = events(spark, dir)
    val ps = panelSplit(df)
    val rows = ps.folds.flatMap { f =>
      f.trainPeriods.map(p => Row(f.index, "train", p)) ++
        f.testPeriods.map(p => Row(f.index, "test", p))
    }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("split", IntegerType, nullable = false),
      StructField("role", StringType, nullable = false),
      StructField("period", DateType, nullable = false))))
  }

  private def cvMse(spark: SparkSession, dir: String): DataFrame = {
    val df = events(spark, dir).cache()
    val ps = panelSplit(df)
    val est = new MeanRegressor().setLabelCol("value")
    val (preds, _) = CrossVal.crossValFitPredict(est, df, ps, labelCol = "value")
    Metrics.perFoldScores(preds, "mean_squared_error", "value", "prediction")
      .select(col("fold"), round(col("score"), 6).as("score"))
  }

  /** SQL CTE prefix shared by the period-fold oracles: ranks the distinct
    * month axis and computes each fold's test_start under
    * nSplits=3, testSize=1, gap=0 (TimeSeriesSplit arithmetic).
    */
  private val oraclePrelude: String =
    """WITH p AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS period FROM events),
      |r AS (SELECT period, row_number() OVER (ORDER BY period) - 1 AS pos FROM p),
      |nn AS (SELECT count(*) AS n FROM p),
      |bounds AS (SELECT i AS split, (SELECT n FROM nn) - (3 - i) AS test_start
      |           FROM (VALUES (0),(1),(2)) t(i))""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_fold_periods" -> ((s, dir) => foldPeriods(s, dir)),
    "q_train_labels" -> ((s, dir) => {
      val df = events(s, dir)
      panelSplit(df).genTrainLabels(df).select("event_id", "period", "value")
    }),
    "q_test_labels" -> ((s, dir) => {
      val df = events(s, dir)
      panelSplit(df).genTestLabels(df).select("event_id", "period", "value")
    }),
    "q_snapshots" -> ((s, dir) => {
      val df = events(s, dir)
      panelSplit(df).genSnapshots(df, Some("period"))
        .select("event_id", "period", "split", "snapshot_period")
    }),
    "q_cv_mse" -> ((s, dir) => cvMse(s, dir)),
  )

  def oracleSql: Map[String, String] = Map(
    "q_fold_periods" ->
      s"""$oraclePrelude
         |SELECT b.split, CASE WHEN r.pos < b.test_start THEN 'train' ELSE 'test' END AS role, r.period
         |FROM r JOIN bounds b
         |  ON r.pos < b.test_start + 1
         |""".stripMargin,
    "q_train_labels" ->
      s"""$oraclePrelude
         |SELECT e.event_id, r.period, e.value
         |FROM events e JOIN r ON CAST(date_trunc('day', e.ts) AS DATE) = r.period
         |WHERE r.pos < (SELECT n FROM nn) - 1
         |""".stripMargin,
    "q_test_labels" ->
      s"""$oraclePrelude
         |SELECT e.event_id, r.period, e.value
         |FROM events e JOIN r ON CAST(date_trunc('day', e.ts) AS DATE) = r.period
         |WHERE r.pos >= (SELECT n FROM nn) - 3
         |""".stripMargin,
    "q_snapshots" ->
      s"""$oraclePrelude,
         |snap AS (SELECT b.split, max(r.period) AS snapshot_period
         |         FROM r JOIN bounds b ON r.pos < b.test_start + 1 GROUP BY b.split)
         |SELECT e.event_id, r.period, b.split, snap.snapshot_period
         |FROM events e
         |JOIN r ON CAST(date_trunc('day', e.ts) AS DATE) = r.period
         |JOIN bounds b ON r.pos < b.test_start + 1
         |JOIN snap ON snap.split = b.split
         |""".stripMargin,
    "q_cv_mse" ->
      s"""$oraclePrelude,
         |train AS (SELECT b.split AS fold, avg(e.value) AS mu
         |          FROM events e JOIN r ON CAST(date_trunc('day', e.ts) AS DATE) = r.period
         |          JOIN bounds b ON r.pos < b.test_start GROUP BY b.split),
         |test AS (SELECT b.split AS fold, e.value
         |         FROM events e JOIN r ON CAST(date_trunc('day', e.ts) AS DATE) = r.period
         |         JOIN bounds b ON r.pos = b.test_start)
         |SELECT t.fold, round(avg(power(t.value - tr.mu, 2)), 6) AS score
         |FROM test t JOIN train tr USING (fold) GROUP BY t.fold
         |""".stripMargin,
  )
}
