package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The injected optimizer rule: declarative range joins plan as hash joins
  * with identical results; everything outside the narrow pattern is
  * untouched; the explode guard fails loudly.
  */
class RangeJoinRewriteSpec extends SparkTestBase {
  import spark.implicits._

  private def withBucket[T](w: Long, maxB: Int = 8)(body: => T): T = {
    spark.conf.set(RangeJoinRewrite.BUCKET_CONF, w.toString)
    spark.conf.set(RangeJoinRewrite.MAXB_CONF, maxB.toString)
    try body finally {
      spark.conf.unset(RangeJoinRewrite.BUCKET_CONF)
      spark.conf.unset(RangeJoinRewrite.MAXB_CONF)
    }
  }

  private val points = (0L until 200L).map(i => (i, i * 7 % 500)).toSeq
  private val intervals = Seq((100L, 0L, 50L), (200L, 40L, 120L), (300L, 480L, 520L))

  private def declarative = {
    val p = points.toDF("pid", "ts")
    val iv = intervals.toDF("ivid", "s", "e")
    p.join(iv, col("ts") >= col("s") && col("ts") < col("e"))
      .select("pid", "ivid")
  }

  test("rewritten declarative join: hash join plan, result identical to brute force") {
    val brute = declarative.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty)
    withBucket(50L) {
      val df = declarative
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"rule did not fire:\n$plan")
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === brute, "rewrite changed the join result")
      assert(df.count() === got.size.toLong, "rewrite introduced duplicate pairs")
    }
  }

  test("without the conf the join is untouched (nested-loop fallback)") {
    val plan = declarative.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("CartesianProduct"))
  }

  test("joins with extra conjuncts are left alone") {
    withBucket(50L) {
      val p = points.toDF("pid", "ts").withColumn("k", col("pid") % 3)
      val iv = intervals.toDF("ivid", "s", "e").withColumn("k", col("ivid") % 3)
      val df = p.join(iv,
        p("k") === iv("k") && col("ts") >= col("s") && col("ts") < col("e"))
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("__graft_bucket"), s"3-conjunct join was rewritten:\n$plan")
    }
  }

  test("BETWEEN (inclusive end) rewrites too; boundary point at end matches") {
    val p = Seq((1L, 0L), (2L, 50L), (3L, 120L), (4L, 121L)).toDF("pid", "ts")
    val iv = Seq((9L, 40L, 120L)).toDF("ivid", "s", "e")
    def q = p.join(iv, col("ts") >= col("s") && col("ts") <= col("e")).select("pid")
    val brute = q.collect().map(_.getLong(0)).toSet
    assert(brute === Set(2L, 3L)) // 120 is IN (inclusive), 121 is out
    withBucket(50L) {
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"BETWEEN not rewritten:\n$plan")
      assert(q.collect().map(_.getLong(0)).toSet === brute)
    }
  }

  test("interval wider than maxBuckets fails loudly") {
    withBucket(10L, maxB = 2) {
      val e = intercept[Exception] {
        declarative.collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("spans more than")), s"got: ${msgs(e)}")
    }
  }

  test("negative point values bucket by floor semantics, result still exact") {
    val p = Seq((1L, -75L), (2L, -50L), (3L, -1L), (4L, 0L)).toDF("pid", "ts")
    val iv = Seq((9L, -100L, 0L)).toDF("ivid", "s", "e")
    def q = p.join(iv, col("ts") >= col("s") && col("ts") < col("e")).select("pid")
    val brute = q.collect().map(_.getLong(0)).toSet
    withBucket(50L) {
      assert(q.collect().map(_.getLong(0)).toSet === brute)
      assert(brute === Set(1L, 2L, 3L))
    }
  }
}
