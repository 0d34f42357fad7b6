package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class EventRollupSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("activeUsers: sliding windows count a user once per report day") {
    // u1 active day 1 and 3; u2 active day 1 only
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-03 10:00:00")),
      (1L, ts("2024-01-03 11:00:00")), // same day dup
      (2L, ts("2024-01-01 09:00:00"))
    ).toDF("user_id", "ts")
    val r = EventAnalytics.activeUsers(ev, "user_id", "ts")
      .collect().map(x => x.getDate(0).toString -> ((x.getLong(1), x.getLong(2), x.getLong(3))))
      .toMap
    assert(r("2024-01-01") == ((2L, 2L, 2L)))
    // day 3: dau = u1; wau window [day-3..day] sees both users
    assert(r("2024-01-03") == ((1L, 2L, 2L)))
    // report days exist only where DAU > 0 (join keyed on the dau frame)
    assert(!r.contains("2024-01-02"))
  }

  test("dailyAnomalies flags a spike day by the integer median/MAD rule") {
    // 9 days at ~10 events, one day at 100
    val rows = (1 to 9).flatMap { d =>
      (1 to (9 + d % 3)).map(i => (d.toLong * 100 + i, ts(f"2024-01-0$d 0${i % 10}:00:00")))
    } ++ (1 to 100).map(i => (1000L + i, ts(s"2024-01-10 ${10 + i % 12}:00:00")))
    val ev = rows.toDF("event_id", "ts")
    val r = EventAnalytics.dailyAnomalies(ev, "ts")
      .collect().map(x => x.getDate(0).toString -> x.getBoolean(5)).toMap
    assert(r("2024-01-10"))
    assert(r.count(_._2) == 1, s"only the spike flags: $r")
  }

  test("rfmSegments scores terciles with reversed recency") {
    // three users: heavy+fresh, medium, light+stale
    val ev = Seq(
      (1L, ts("2024-01-30 10:00:00"), "purchase", 100.0),
      (1L, ts("2024-01-29 10:00:00"), "purchase", 100.0),
      (1L, ts("2024-01-28 10:00:00"), "purchase", 100.0),
      (2L, ts("2024-01-15 10:00:00"), "purchase", 50.0),
      (2L, ts("2024-01-14 10:00:00"), "purchase", 50.0),
      (3L, ts("2024-01-01 10:00:00"), "purchase", 10.0),
      (3L, ts("2024-01-02 10:00:00"), "click", 999.0) // non-purchase ignored
    ).toDF("user_id", "ts", "event_type", "value")
    val r = EventAnalytics.rfmSegments(ev, "user_id", "ts", "event_type", "purchase", "value")
      .collect().map(x => x.getLong(0) -> x.getString(7)).toMap
    assert(r(1L) == "3-3-3")
    assert(r(3L) == "1-1-1")
    val m = EventAnalytics.rfmSegments(ev, "user_id", "ts", "event_type", "purchase", "value")
      .filter(col("user_id") === 3L).collect().head
    assert(m.getLong(1) == 29L) // recency vs max purchase day 2024-01-30
    assert(m.getDouble(3) == 10.0)
  }
}
