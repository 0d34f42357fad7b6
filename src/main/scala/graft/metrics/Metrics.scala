package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-fold metric aggregates — the Spark re-expression of the reference's
  * scorer layer (`panelsplit/metrics.py`). Every metric is a single-pass
  * decomposable SQL aggregate over a predictions frame carrying
  * (fold, label, prediction) — map-side partial aggregation, whole-stage
  * codegen, no driver math on row data. Confusion-matrix families reduce to
  * four conditional sums. Sign convention matches sklearn scorers: `neg_*`
  * registry entries negate (`metrics.py:163,388-398`).
  */
object Metrics {

  /** An aggregate-expression metric: `agg(label, prediction)` must be a valid
    * aggregate Column. `greaterIsBetter=false` metrics get a `neg_` scorer.
    */
  final case class MetricSpec(
      name: String,
      greaterIsBetter: Boolean,
      agg: (Column, Column) => Column)

  // ---- regression -------------------------------------------------------
  private def mse(l: Column, p: Column) = avg(pow(l - p, 2))
  private def rmse(l: Column, p: Column) = sqrt(mse(l, p))
  private def mae(l: Column, p: Column) = avg(abs(l - p))
  private def mape(l: Column, p: Column) =
    // sklearn clamps |y| at eps to avoid div-by-zero; data here is non-degenerate
    avg(abs(l - p) / greatest(abs(l), lit(1e-15)))
  private def medae(l: Column, p: Column) =
    expr_percentile(abs(l - p))
  private def expr_percentile(c: Column): Column =
    call_function("percentile", c, lit(0.5))
  private def r2(l: Column, p: Column) = {
    // Centered, numerically stable form: the uncentered expansion
    // sum(y²) − sum(y)²/n cancels ~9 significant digits at sum(y)~1e7 and
    // flips last-ulp under parallel summation order. var_pop uses stable
    // central-moment merges in both Spark and DuckDB, so the oracle compare
    // is reproducible across runs.
    lit(1.0) - avg(pow(l - p, 2)) / var_pop(l)
  }
  private def explainedVariance(l: Column, p: Column) = {
    // 1 - Var(y - yhat) / Var(y), population variances
    lit(1.0) - var_pop(l - p) / var_pop(l)
  }
  private def maxError(l: Column, p: Column) = max(abs(l - p))
  private def msle(l: Column, p: Column) = avg(pow(log1p(l) - log1p(p), 2))
  private def rmsle(l: Column, p: Column) = sqrt(msle(l, p))
  private def meanPoissonDeviance(l: Column, p: Column) =
    avg(lit(2.0) * (when(l > 0, l * log(l / p)).otherwise(lit(0.0)) - l + p))
  private def meanGammaDeviance(l: Column, p: Column) =
    avg(lit(2.0) * (log(p / l) + l / p - lit(1.0)))

  // ---- classification (hard labels in {0,1}) ----------------------------
  private def tp(l: Column, p: Column) = sum(when(l === 1 && p === 1, 1).otherwise(0)).cast("double")
  private def fp(l: Column, p: Column) = sum(when(l === 0 && p === 1, 1).otherwise(0)).cast("double")
  private def fn(l: Column, p: Column) = sum(when(l === 1 && p === 0, 1).otherwise(0)).cast("double")
  private def tn(l: Column, p: Column) = sum(when(l === 0 && p === 0, 1).otherwise(0)).cast("double")

  private def accuracy(l: Column, p: Column) = avg(when(l === p, 1.0).otherwise(0.0))
  private def precisionM(l: Column, p: Column) = {
    val d = tp(l, p) + fp(l, p)
    when(d === 0, 0.0).otherwise(tp(l, p) / d)
  }
  private def recallM(l: Column, p: Column) = {
    val d = tp(l, p) + fn(l, p)
    when(d === 0, 0.0).otherwise(tp(l, p) / d)
  }
  private def f1(l: Column, p: Column) = {
    val d = lit(2.0) * tp(l, p) + fp(l, p) + fn(l, p)
    when(d === 0, 0.0).otherwise(lit(2.0) * tp(l, p) / d)
  }
  private def jaccard(l: Column, p: Column) = {
    val d = tp(l, p) + fp(l, p) + fn(l, p)
    when(d === 0, 0.0).otherwise(tp(l, p) / d)
  }
  private def balancedAccuracy(l: Column, p: Column) = {
    val tpr = tp(l, p) / (tp(l, p) + fn(l, p))
    val tnr = tn(l, p) / (tn(l, p) + fp(l, p))
    (tpr + tnr) / 2.0
  }
  private def mcc(l: Column, p: Column) = {
    val (a, b, c, d) = (tp(l, p), fp(l, p), fn(l, p), tn(l, p))
    val num = a * d - b * c
    val den = sqrt((a + b) * (a + c) * (d + b) * (d + c))
    when(den === 0, 0.0).otherwise(num / den)
  }
  /** Probabilistic metrics: `p` is a probability of the positive class. */
  private def logLoss(l: Column, p: Column) = {
    val eps = lit(1e-15)
    val pc = least(greatest(p, eps), lit(1.0) - eps)
    -avg(l * log(pc) + (lit(1.0) - l) * log(lit(1.0) - pc))
  }
  private def brier(l: Column, p: Column) = avg(pow(l - p, 2))

  /** ROC-AUC via the Mann-Whitney rank statistic, tie-corrected (equivalent
    * to sklearn's trapezoid AUC): AUC = (Σ rank⁺ − n⁺(n⁺+1)/2) / (n⁺·n⁻)
    * with average ranks over the score column. Not a plain aggregate (needs a
    * rank), so exposed as [[rocAuc]] rather than a registry `agg`.
    */
  def rocAuc(preds: DataFrame, labelCol: String, scoreCol: String, foldCol: String = "fold"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // average rank = (rank + (count_of_ties - 1)/2); derive from two ranks
    val w = Window.partitionBy(foldCol).orderBy(col(scoreCol))
    val ranked = preds
      .withColumn("__r_lo", rank().over(w))
      .withColumn("__cnt", count(lit(1)).over(Window.partitionBy(col(foldCol), col(scoreCol))))
      .withColumn("__avg_rank", col("__r_lo") + (col("__cnt") - 1) / 2.0)
    ranked.groupBy(foldCol)
      .agg(
        sum(when(col(labelCol) === 1, col("__avg_rank"))).as("__sum_pos_rank"),
        sum(when(col(labelCol) === 1, 1).otherwise(0)).cast("double").as("__npos"),
        sum(when(col(labelCol) =!= 1, 1).otherwise(0)).cast("double").as("__nneg"))
      .select(col(foldCol),
        ((col("__sum_pos_rank") - col("__npos") * (col("__npos") + 1) / 2.0)
          / (col("__npos") * col("__nneg"))).as("score"))
  }

  /** Multiclass averaged precision/recall/F1 from the per-class confusion
    * counts (`groupBy(fold, class)` over one-vs-rest tallies) — the
    * reference's averaged scorer variants (`metrics.py:713-724`).
    *
    * @param average "macro" (unweighted class mean), "micro" (global
    *                counts), or "weighted" (support-weighted class mean)
    * Output: (fold, precision, recall, f1).
    */
  def multiclassScores(
      preds: DataFrame,
      labelCol: String,
      predictionCol: String,
      average: String,
      foldCol: String = "fold"): DataFrame = {
    require(Seq("macro", "micro", "weighted").contains(average), s"bad average '$average'")
    val l = col(labelCol)
    val p = col(predictionCol)
    // per (fold, class): tp, predicted-count, actual-count — via two tagged passes
    val perClass = preds.select(col(foldCol), l.as("cls"), p.as("pred"))
      .groupBy(col(foldCol), col("cls"))
      .agg(
        sum(when(col("cls") === col("pred"), 1).otherwise(0)).cast("double").as("tp"),
        count(lit(1)).cast("double").as("support"))
      .join(
        preds.groupBy(col(foldCol), p.as("cls"))
          .agg(count(lit(1)).cast("double").as("predicted")),
        Seq(foldCol, "cls"), "full_outer")
      .na.fill(0.0, Seq("tp", "support", "predicted"))
    val prec = when(col("predicted") === 0, 0.0).otherwise(col("tp") / col("predicted"))
    val rec = when(col("support") === 0, 0.0).otherwise(col("tp") / col("support"))
    val f1c = when(prec + rec === 0, 0.0).otherwise(lit(2.0) * prec * rec / (prec + rec))
    average match {
      case "macro" =>
        perClass.groupBy(col(foldCol))
          .agg(avg(prec).as("precision"), avg(rec).as("recall"), avg(f1c).as("f1"))
          .orderBy(col(foldCol))
      case "weighted" =>
        perClass.groupBy(col(foldCol))
          .agg(
            (sum(prec * col("support")) / sum(col("support"))).as("precision"),
            (sum(rec * col("support")) / sum(col("support"))).as("recall"),
            (sum(f1c * col("support")) / sum(col("support"))).as("f1"))
          .orderBy(col(foldCol))
      case "micro" =>
        // micro precision == recall == f1 == accuracy for single-label multiclass
        perClass.groupBy(col(foldCol))
          .agg((sum(col("tp")) / sum(col("support"))).as("precision"))
          .withColumn("recall", col("precision"))
          .withColumn("f1", col("precision"))
          .orderBy(col(foldCol))
    }
  }

  /** Average precision (area under the precision-recall curve, step
    * integration like sklearn): AP = Σ_n (R_n − R_{n−1}) P_n over DISTINCT
    * thresholds in score-descending order. Grouping ties at the threshold
    * level (exactly sklearn's `precision_recall_curve` semantics) makes the
    * result tie-invariant — no tie-break column needed, deterministic under
    * any partition-parallel ordering.
    */
  def averagePrecision(preds: DataFrame, labelCol: String, scoreCol: String,
      foldCol: String = "fold"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byThr = preds.groupBy(col(foldCol), col(scoreCol).as("__s"))
      .agg(
        sum(when(col(labelCol) === 1, 1).otherwise(0)).cast("double").as("__pos"),
        count(lit(1)).cast("double").as("__cnt"))
    val w = Window.partitionBy(foldCol).orderBy(col("__s").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    byThr
      .withColumn("__cum_pos", sum(col("__pos")).over(w))
      .withColumn("__cum_cnt", sum(col("__cnt")).over(w))
      .groupBy(col(foldCol))
      .agg((sum(col("__pos") * col("__cum_pos") / col("__cum_cnt")) / sum(col("__pos"))).as("score"))
      .orderBy(col(foldCol))
  }

  /** Adjusted Rand Index from the (label, cluster) contingency table —
    * `groupBy(fold,label,cluster).count` + per-fold combinatorial sums, all
    * decomposable aggregates (sklearn `adjusted_rand_score` formula).
    */
  def adjustedRandIndex(preds: DataFrame, labelCol: String, clusterCol: String, foldCol: String = "fold"): DataFrame = {
    def c2(x: Column) = x * (x - 1) / 2.0
    val cont = preds.groupBy(col(foldCol), col(labelCol).as("l"), col(clusterCol).as("c"))
      .agg(count(lit(1)).cast("double").as("nij"))
    val rows = cont.groupBy(col(foldCol), col("l")).agg(sum(col("nij")).as("ai"))
      .groupBy(col(foldCol)).agg(sum(c2(col("ai"))).as("sum_ai2"))
    val cols = cont.groupBy(col(foldCol), col("c")).agg(sum(col("nij")).as("bj"))
      .groupBy(col(foldCol)).agg(sum(c2(col("bj"))).as("sum_bj2"))
    val cells = cont.groupBy(col(foldCol)).agg(
      sum(c2(col("nij"))).as("sum_nij2"), sum(col("nij")).as("n"))
    cells.join(rows, Seq(foldCol)).join(cols, Seq(foldCol))
      .select(col(foldCol), {
        val expected = col("sum_ai2") * col("sum_bj2") / c2(col("n"))
        val maxIdx = (col("sum_ai2") + col("sum_bj2")) / 2.0
        when(maxIdx === expected, 1.0) // degenerate: single cluster == single class
          .otherwise((col("sum_nij2") - expected) / (maxIdx - expected)).as("score")
      })
      .orderBy(col(foldCol))
  }

  /** Normalized Mutual Information (arithmetic mean normalization, the
    * sklearn default): MI / ((H(U) + H(V)) / 2), from the same contingency
    * aggregates as ARI. Natural log.
    */
  def normalizedMutualInfo(preds: DataFrame, labelCol: String, clusterCol: String, foldCol: String = "fold"): DataFrame = {
    val cont = preds.groupBy(col(foldCol), col(labelCol).as("l"), col(clusterCol).as("c"))
      .agg(count(lit(1)).cast("double").as("nij"))
    val n = cont.groupBy(col(foldCol)).agg(sum(col("nij")).as("n"))
    val ai = cont.groupBy(col(foldCol), col("l")).agg(sum(col("nij")).as("ai"))
    val bj = cont.groupBy(col(foldCol), col("c")).agg(sum(col("nij")).as("bj"))
    val mi = cont.join(ai, Seq(foldCol, "l")).join(bj, Seq(foldCol, "c")).join(n, Seq(foldCol))
      .groupBy(col(foldCol))
      .agg(sum((col("nij") / col("n")) * log(col("nij") * col("n") / (col("ai") * col("bj")))).as("mi"))
    val hu = ai.join(n, Seq(foldCol)).groupBy(col(foldCol))
      .agg((-sum((col("ai") / col("n")) * log(col("ai") / col("n")))).as("hu"))
    val hv = bj.join(n, Seq(foldCol)).groupBy(col(foldCol))
      .agg((-sum((col("bj") / col("n")) * log(col("bj") / col("n")))).as("hv"))
    mi.join(hu, Seq(foldCol)).join(hv, Seq(foldCol))
      .select(col(foldCol),
        when(col("hu") + col("hv") === 0, 1.0)
          .otherwise(col("mi") / ((col("hu") + col("hv")) / 2.0)).as("score"))
      .orderBy(col(foldCol))
  }

  val registry: Map[String, MetricSpec] = {
    val base = Seq(
      MetricSpec("mean_squared_error", greaterIsBetter = false, mse),
      MetricSpec("root_mean_squared_error", greaterIsBetter = false, rmse),
      MetricSpec("mean_absolute_error", greaterIsBetter = false, mae),
      MetricSpec("mean_absolute_percentage_error", greaterIsBetter = false, mape),
      MetricSpec("median_absolute_error", greaterIsBetter = false, medae),
      MetricSpec("mean_squared_log_error", greaterIsBetter = false, msle),
      MetricSpec("root_mean_squared_log_error", greaterIsBetter = false, rmsle),
      MetricSpec("mean_poisson_deviance", greaterIsBetter = false, meanPoissonDeviance),
      MetricSpec("mean_gamma_deviance", greaterIsBetter = false, meanGammaDeviance),
      MetricSpec("max_error", greaterIsBetter = false, maxError),
      MetricSpec("r2", greaterIsBetter = true, r2),
      MetricSpec("explained_variance", greaterIsBetter = true, explainedVariance),
      MetricSpec("accuracy", greaterIsBetter = true, accuracy),
      MetricSpec("balanced_accuracy", greaterIsBetter = true, balancedAccuracy),
      MetricSpec("precision", greaterIsBetter = true, precisionM),
      MetricSpec("recall", greaterIsBetter = true, recallM),
      MetricSpec("f1", greaterIsBetter = true, f1),
      MetricSpec("jaccard", greaterIsBetter = true, jaccard),
      MetricSpec("matthews_corrcoef", greaterIsBetter = true, mcc),
      MetricSpec("log_loss", greaterIsBetter = false, logLoss),
      MetricSpec("brier_score", greaterIsBetter = false, brier))
    base.map(m => m.name -> m).toMap
  }

  /** Resolve a scorer name: a bare metric name returns the raw metric value;
    * `neg_<metric>` applies the sklearn scorer sign flip
    * (`metrics.py:163`, greater_is_better=False → negated score).
    */
  def resolve(scorer: String): (MetricSpec, Double) =
    registry.get(scorer) match {
      case Some(m) => (m, 1.0)
      case None if scorer.startsWith("neg_") && registry.contains(scorer.stripPrefix("neg_")) =>
        (registry(scorer.stripPrefix("neg_")), -1.0)
      case None =>
        throw new IllegalArgumentException(
          s"Unknown scorer '$scorer'. Known: ${registry.keys.toSeq.sorted.mkString(", ")}")
    }

  /** Per-fold scores as a DataFrame (fold, score), ordered by fold —
    * reference `_Scorer._score` returns the per-fold list in fold order
    * (`metrics.py:352-398`).
    */
  def perFoldScores(
      preds: DataFrame,
      scorer: String,
      labelCol: String = "label",
      predictionCol: String = "prediction",
      foldCol: String = "fold"): DataFrame = {
    val (spec, sign) = resolve(scorer)
    preds.groupBy(col(foldCol))
      .agg((spec.agg(col(labelCol).cast("double"), col(predictionCol).cast("double")) * sign).as("score"))
      .orderBy(col(foldCol))
  }

  /** Driver-side convenience: fold-ordered score vector. */
  def perFoldScoreSeq(
      preds: DataFrame,
      scorer: String,
      labelCol: String = "label",
      predictionCol: String = "prediction"): Seq[Double] =
    perFoldScores(preds, scorer, labelCol, predictionCol)
      .collect().map(_.getDouble(1)).toSeq
}
