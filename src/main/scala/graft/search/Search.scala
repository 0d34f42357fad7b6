package graft.search

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.pipeline.SequentialCVPipeline

import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import scala.util.{Failure, Success, Try}

/** One evaluated candidate. */
final case class CandidateResult(
    index: Int,
    params: Map[String, Any],
    splitScores: Seq[Double],
    meanScore: Double,
    stdScore: Double,
    var rank: Int,
    failed: Boolean,
    error: Option[String])

/** Hyper-parameter search over a `SequentialCVPipeline` — the Spark
  * re-expression of the reference's `BaseSearch`/`GridSearch`/
  * `RandomizedSearch` (`panelsplit/model_selection/model_selection.py`).
  *
  * Candidates fan out as driver-side jobs over a shared (cached) DataFrame;
  * each fit is itself a set of per-fold Spark jobs. Semantics preserved:
  * std is population (ddof=0, `model_selection.py:856-858`), rank is
  * ties→min with NaN→worst (`:876-884`), fit failures fill `errorScore`
  * and warn, all-failed raises (`_validation.py:88-166`).
  */
abstract class BaseSearch(
    val pipeline: SequentialCVPipeline,
    val scoring: String,
    val labelCol: String,
    val refit: Boolean,
    val errorScore: Double,
    val parallelism: Int) {

  protected def candidates(): Seq[Map[String, Any]]

  var results: Seq[CandidateResult] = Nil
  var bestIndex: Int = -1
  var bestEstimator: Option[SequentialCVPipeline] = None

  def bestParams: Map[String, Any] = results(bestIndex).params
  def bestScore: Double = results(bestIndex).meanScore

  def fit(df: DataFrame): this.type = {
    val cands = candidates()
    require(cands.nonEmpty, "empty parameter space")

    val tasks: Seq[() => CandidateResult] = cands.zipWithIndex.map { case (params, i) => () =>
      Try {
        val cand = pipeline.copyWith(params)
        cand.fit(df)
        cand.score(df, scoring, labelCol)
      } match {
        case Success(scores) =>
          mkResult(i, params, scores, failed = false, None)
        case Failure(e) =>
          System.err.println(s"[search] candidate $i failed: ${e.getMessage}; filling errorScore")
          mkResult(i, params, Seq.fill(pipeline.nScoreSplits)(errorScore), failed = true,
            Some(e.getMessage))
      }
    }
    val evaluated = runAll(tasks, parallelism)
    if (evaluated.forall(_.failed))
      throw new IllegalStateException(
        s"All ${evaluated.size} fits failed. First error: ${evaluated.head.error.getOrElse("?")}")

    // rank: ties -> min, NaN -> worst (scipy rankdata(-means, method="min"))
    val means = evaluated.map(_.meanScore)
    evaluated.foreach { r =>
      r.rank =
        if (r.meanScore.isNaN) means.count(!_.isNaN) + 1
        else 1 + means.count(m => !m.isNaN && m > r.meanScore)
    }
    results = evaluated
    bestIndex = results.filter(!_.meanScore.isNaN).minBy(_.rank).index
    if (refit) {
      val best = pipeline.copyWith(results(bestIndex).params)
      best.fit(df)
      bestEstimator = Some(best)
    }
    this
  }

  private def mkResult(i: Int, params: Map[String, Any], scores: Seq[Double],
      failed: Boolean, error: Option[String]): CandidateResult = {
    val mean = scores.sum / scores.size
    val std = math.sqrt(scores.map(s => math.pow(s - mean, 2)).sum / scores.size) // ddof=0
    CandidateResult(i, params, scores, mean, std, rank = 0, failed, error)
  }

  /** `cv_results_` as a DataFrame: one row per candidate with params_json,
    * split{i}_test_score, mean/std/rank (`model_selection.py:828-923`).
    */
  def cvResults(spark: SparkSession): DataFrame = {
    val nSplits = results.map(_.splitScores.size).max
    val fields = Seq(
      StructField("candidate", IntegerType, nullable = false),
      StructField("params", StringType, nullable = false)) ++
      (0 until nSplits).map(i => StructField(s"split${i}_test_score", DoubleType)) ++
      Seq(
        StructField("mean_test_score", DoubleType),
        StructField("std_test_score", DoubleType),
        StructField("rank_test_score", IntegerType, nullable = false))
    val rows = results.map { r =>
      val paramStr = r.params.toSeq.sortBy(_._1)
        .map { case (k, v) => s"$k=$v" }.mkString(";")
      Row.fromSeq(
        Seq[Any](r.index, paramStr) ++
          (0 until nSplits).map(i => r.splitScores.lift(i).getOrElse(Double.NaN)) ++
          Seq[Any](r.meanScore, r.stdScore, r.rank))
    }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, StructType(fields))
  }

  private def runAll[T](tasks: Seq[() => T], par: Int): Seq[T] =
    if (par <= 1 || tasks.size <= 1) tasks.map(_())
    else {
      val pool = Executors.newFixedThreadPool(math.min(par, tasks.size))
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      try Await.result(Future.sequence(tasks.map(t => Future(t()))), Duration.Inf)
      finally pool.shutdown()
    }
}

/** Exhaustive cartesian product of `paramGrid` lists
  * (`model_selection.py:1210-1212`). Keys use `step__param`.
  */
final class GridSearch(
    pipeline: SequentialCVPipeline,
    val paramGrid: Map[String, Seq[Any]],
    scoring: String,
    labelCol: String,
    refit: Boolean = true,
    errorScore: Double = Double.NaN,
    parallelism: Int = 1)
  extends BaseSearch(pipeline, scoring, labelCol, refit, errorScore, parallelism) {

  protected def candidates(): Seq[Map[String, Any]] = {
    val keys = paramGrid.keys.toSeq.sorted
    keys.foldLeft(Seq(Map.empty[String, Any])) { (acc, k) =>
      for (m <- acc; v <- paramGrid(k)) yield m + (k -> v)
    }
  }
}

/** Seeded sampling of `nIter` distinct settings; exhaustive when the grid is
  * smaller than `nIter` (sklearn `ParameterSampler` without-replacement
  * behavior, `model_selection.py:1517-1523`).
  */
final class RandomizedSearch(
    pipeline: SequentialCVPipeline,
    val paramGrid: Map[String, Seq[Any]],
    val nIter: Int,
    val seed: Long = 0L,
    scoring: String,
    labelCol: String,
    refit: Boolean = true,
    errorScore: Double = Double.NaN,
    parallelism: Int = 1)
  extends BaseSearch(pipeline, scoring, labelCol, refit, errorScore, parallelism) {

  protected def candidates(): Seq[Map[String, Any]] = {
    val keys = paramGrid.keys.toSeq.sorted
    val all = keys.foldLeft(Seq(Map.empty[String, Any])) { (acc, k) =>
      for (m <- acc; v <- paramGrid(k)) yield m + (k -> v)
    }
    if (all.size <= nIter) all
    else new scala.util.Random(seed).shuffle(all).take(nIter)
  }
}
