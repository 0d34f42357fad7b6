package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class EventAnalyticsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // user 1: completes A→B→C in order
  // user 2: B before A (must NOT count for step 2), completes A only
  // user 3: A then C (skips B — strict order means step 3 not reached)
  // user 4: A, B, C all in order but B is 10 days after A (window test)
  private lazy val ev = Seq(
    (1L, ts("2024-01-01 00:00:00"), "A"), (1L, ts("2024-01-01 02:00:00"), "B"),
    (1L, ts("2024-01-01 03:00:00"), "C"),
    (2L, ts("2024-01-01 00:00:00"), "B"), (2L, ts("2024-01-02 00:00:00"), "A"),
    (3L, ts("2024-01-01 00:00:00"), "A"), (3L, ts("2024-01-01 01:00:00"), "C"),
    (4L, ts("2024-01-01 00:00:00"), "A"), (4L, ts("2024-01-11 00:00:00"), "B"),
    (4L, ts("2024-01-11 01:00:00"), "C")
  ).toDF("user_id", "ts", "event_type")

  test("ordered funnel counts strict-order completions only") {
    val rep = EventAnalytics.funnelReport(ev, "user_id", "ts", "event_type",
      Seq("A", "B", "C")).collect().sortBy(_.getInt(0))
    assert(rep.map(_.getLong(2)).toSeq == Seq(4L, 2L, 2L)) // A:1,2,3,4  B:1,4  C:1,4
    assert(rep(0).getDouble(3) == 1.0)
    assert(rep(1).getDouble(3) == 0.5)
    // user1 A→B 2h, user4 A→B 240h → mean 121h
    assert(math.abs(rep(1).getDouble(4) - 121.0) < 1e-9)
  }

  test("windowed funnel drops completions outside the window from t1") {
    val rep = EventAnalytics.funnelReport(ev, "user_id", "ts", "event_type",
      Seq("A", "B", "C"), windowHours = Some(24)).collect().sortBy(_.getInt(0))
    assert(rep.map(_.getLong(2)).toSeq == Seq(4L, 1L, 1L)) // user4's B at +240h excluded
  }

  test("a user whose later step precedes the first step does not convert") {
    val frames = EventAnalytics.funnelTimes(ev, "user_id", "ts", "event_type", Seq("A", "B"))
    val users = frames(1).select("user_id").as[Long].collect().toSet
    assert(users == Set(1L, 4L))
  }

  test("cohort retention cohorts by first-event day and counts active days") {
    val e2 = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-02 10:00:00")),
      (1L, ts("2024-01-02 11:00:00")), // same day twice → one active cell
      (2L, ts("2024-01-01 09:00:00")),
      (3L, ts("2024-01-02 09:00:00")), (3L, ts("2024-01-04 09:00:00"))
    ).toDF("user_id", "ts").withColumn("event_type", lit("x"))
    val r = EventAnalytics.cohortRetention(e2, "user_id", "ts")
      .collect().map(x => (x.getDate(0).toString, x.getInt(1), x.getLong(2), x.getLong(3)))
      .toSet
    assert(r == Set(
      ("2024-01-01", 0, 2L, 2L), ("2024-01-01", 1, 1L, 2L),
      ("2024-01-02", 0, 1L, 1L), ("2024-01-02", 2, 1L, 1L)))
  }

  test("funnel plan has no Window over the event axis") {
    val rep = EventAnalytics.funnelReport(ev, "user_id", "ts", "event_type", Seq("A", "B", "C"))
    val plan = rep.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"funnel planned a Window:\n$plan")
  }
}
