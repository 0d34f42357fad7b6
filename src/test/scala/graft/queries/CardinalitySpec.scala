package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sources.Tables

/** The cardinality card's production swap: exact countDistinct (the
  * cross-engine gate) vs approx_count_distinct (HLL++ — constant-size
  * mergeable sketch, the 100 TB path where exact distinct shuffles every
  * distinct value).
  */
class CardinalitySpec extends SparkTestBase {

  test("approx_count_distinct tracks exact within 2% on the gate corpus") {
    val d = Tables.cached(spark, "/root/testdata/sf0.001", "documents")
    val r = d.agg(
      countDistinct(md5(col("text"))).as("exact"),
      approx_count_distinct(md5(col("text"))).as("approx")).head()
    val exact = r.getLong(0)
    val approx = r.getLong(1)
    assert(exact > 0)
    assert(math.abs(approx - exact).toDouble / exact <= 0.02,
      s"approx $approx drifted > 2% from exact $exact")
  }

  test("the sketch aggregates map-side: partial approx stage in the plan") {
    val d = Tables.cached(spark, "/root/testdata/sf0.001", "documents")
    val plan = d.groupBy(col("source"))
      .agg(approx_count_distinct(md5(col("text"))))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_approx_count_distinct"),
      s"no partial (map-side) sketch stage:\n$plan")
  }
}
