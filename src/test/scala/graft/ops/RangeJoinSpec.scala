package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkTestBase {
  private lazy val sp = spark
  import sp.implicits._

  test("bucketed range join equals the brute-force BETWEEN join, no duplicates") {
    val points = (0L until 500L).map(i => (i, i * 17 % 1000)).toDF("pid", "ts")
    val intervals = Seq((1L, 0L, 100L), (2L, 50L, 250L), (3L, 240L, 241L), (4L, 990L, 1100L))
      .toDF("iid", "s", "e")
    val got = RangeJoin.joinPointsToIntervals(points, "ts", intervals, "s", "e",
        bucketWidth = 100L, maxBucketsPerInterval = 4)
      .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
    val expected = points.crossJoin(intervals)
      .filter(col("ts") >= col("s") && col("ts") < col("e"))
      .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
    assert(got == expected)
    assert(got.distinct.size == got.size, "duplicate pairs")
    assert(got.nonEmpty)
  }

  test("plan is an equi hash join, not a nested loop") {
    val points = (0L until 100L).map(i => (i, i)).toDF("pid", "ts")
    val intervals = Seq((1L, 10L, 20L)).toDF("iid", "s", "e")
    val j = RangeJoin.joinPointsToIntervals(points, "ts", intervals, "s", "e", 16L)
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
  }

  test("interval wider than the bucket cap fails loudly") {
    val points = Seq((1L, 5L)).toDF("pid", "ts")
    val intervals = Seq((1L, 0L, 1000L)).toDF("iid", "s", "e")
    val ex = intercept[Exception] {
      RangeJoin.joinPointsToIntervals(points, "ts", intervals, "s", "e",
        bucketWidth = 10L, maxBucketsPerInterval = 8).collect()
    }
    assert(ex.getMessage != null && ex.getMessage.contains("spans more than"))
  }

  test("exclusive end: a point exactly at interval end does not match") {
    val points = Seq((1L, 100L)).toDF("pid", "ts")
    val intervals = Seq((9L, 50L, 100L)).toDF("iid", "s", "e")
    assert(RangeJoin.joinPointsToIntervals(points, "ts", intervals, "s", "e", 50L).count() == 0)
  }

  test("equi keys compose with the bucket key") {
    val points = Seq((1L, "u1", 10L), (2L, "u2", 10L)).toDF("pid", "user", "ts")
    val intervals = Seq(("u1", 0L, 20L)).toDF("user", "s", "e")
    val got = RangeJoin.joinPointsToIntervals(points, "ts", intervals, "s", "e",
        bucketWidth = 20L, equiKeys = Seq("user"))
      .select("pid").as[Long].collect().toSeq
    assert(got == Seq(1L))
  }
}
