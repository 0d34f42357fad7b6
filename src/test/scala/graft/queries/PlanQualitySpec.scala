package graft.queries

import graft.SparkTestBase
import graft.cv.PanelSplit
import graft.metrics.Metrics
import org.apache.spark.sql.functions._

/** Physical-plan assertions — the properties that make these operators
  * scale-safe are checked from the executed plan, not assumed: metric
  * aggregates stay inside whole-stage codegen with no UDF islands, fold
  * predicates reach the parquet scan as pushed filters with pruned schemas,
  * and genSnapshots' membership join broadcasts the tiny fold table.
  */
class PlanQualitySpec extends SparkTestBase {
  private lazy val sp = spark
  import sp.implicits._

  test("metric aggregates run inside whole-stage codegen with no UDF islands") {
    val preds = (1 to 100).map(i => (i % 3, i.toDouble, i * 1.1)).toDF("fold", "label", "prediction")
    for (m <- Seq("mean_squared_error", "matthews_corrcoef", "log_loss")) {
      val df = Metrics.perFoldScores(preds, m, "label", "prediction")
      df.collect() // materialize so AQE finalizes the plan (incl. codegen stages)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("*("), s"$m: no WholeStageCodegen stage in\n$plan")
      assert(plan.contains("HashAggregate"), s"$m: expected HashAggregate")
      assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
        s"$m: UDF island in plan")
    }
  }

  test("fold predicates push down to the parquet scan and prune columns") {
    val path = s"target/planquality/events_${System.nanoTime()}"
    (1 to 100).map(i => (i, i % 10, i * 1.0)).toDF("event_id", "period", "value")
      .write.mode("overwrite").parquet(path)
    val df = spark.read.parquet(path)
    val ps = PanelSplit(df, "period", nSplits = 2, testSize = 1)
    val filtered = df.filter(ps.folds.head.trainPredicate("period", None))
      .select("period", "value") // 2-column projection must shrink ReadSchema
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") && plan.contains("period"),
      s"fold predicate not pushed:\n$plan")
    assert(plan.contains("ReadSchema") && !plan.contains("event_id"),
      s"column pruning failed (event_id still read):\n$plan")
  }

  test("genSnapshots joins the fold-membership table via broadcast") {
    val df = (for (p <- 1 to 6; i <- 0 to 3) yield (p * 10 + i, p, i.toDouble))
      .toDF("id", "period", "y")
    val ps = PanelSplit(df, "period", nSplits = 3, testSize = 1)
    val plan = ps.genSnapshots(df).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"membership join not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected shuffle join:\n$plan")
  }
}
