package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  // quotes: the left side; trades: the right side (key, time, payload)
  private def quotes = Seq(
    ("a", 10L, "q1"), ("a", 20L, "q2"), ("a", 30L, "q3"),
    ("b", 15L, "q4"), ("c", 5L, "q5")
  ).toDF("k", "t", "q")

  private def trades = Seq(
    ("a", 10L, 1.0), ("a", 25L, 2.0),
    ("b", 10L, 3.0), ("b", 16L, 4.0)
  ).toDF("k", "t", "v")

  test("backward: latest right <= left, exact match allowed, null when none") {
    val out = AsOfJoin.asOf(quotes, trades, Seq("k"), "t", "t")
      .select("k", "t", "q", "r_t", "r_v")
      .as[(String, Long, String, Option[Long], Option[Double])]
      .collect().sortBy(r => (r._1, r._2))
    assert(out === Array(
      ("a", 10L, "q1", Some(10L), Some(1.0)), // exact-equal time matches
      ("a", 20L, "q2", Some(10L), Some(1.0)),
      ("a", 30L, "q3", Some(25L), Some(2.0)),
      ("b", 15L, "q4", Some(10L), Some(3.0)), // 16 is in the future
      ("c", 5L, "q5", None, None)))           // key with no right rows
  }

  test("forward: earliest right >= left") {
    val out = AsOfJoin.asOf(quotes, trades, Seq("k"), "t", "t",
        direction = "forward")
      .select("k", "t", "r_t")
      .as[(String, Long, Option[Long])]
      .collect().sortBy(r => (r._1, r._2))
    assert(out === Array(
      ("a", 10L, Some(10L)), ("a", 20L, Some(25L)), ("a", 30L, None),
      ("b", 15L, Some(16L)), ("c", 5L, None)))
  }

  test("within tolerance nulls out stale matches") {
    val out = AsOfJoin.asOf(quotes, trades, Seq("k"), "t", "t",
        within = Some((l, r) => l - r <= 5L))
      .select("k", "t", "r_t")
      .as[(String, Long, Option[Long])]
      .collect().sortBy(r => (r._1, r._2))
    assert(out === Array(
      ("a", 10L, Some(10L)),
      ("a", 20L, None),        // 20 - 10 = 10 > 5: stale
      ("a", 30L, Some(25L)),
      ("b", 15L, Some(10L)),
      ("c", 5L, None)))
  }

  test("plan has no join operator and exactly one exchange") {
    val out = AsOfJoin.asOf(quotes, trades, Seq("k"), "t", "t")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"row-multiplying join in plan:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1,
      s"expected one key shuffle:\n$plan")
  }

  test("left columns pass through unchanged; right payload is prefixed") {
    val out = AsOfJoin.asOf(quotes, trades, Seq("k"), "t", "t",
      rightPrefix = "trade_")
    assert(out.columns.toSeq === Seq("k", "t", "q", "trade_t", "trade_v"))
  }
}
