package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ExperimentsSpec extends SparkTestBase {
  import spark.implicits._

  test("abTest matches the textbook pooled z") {
    // arm 0: 60/100 convert; arm 1: 40/100
    val rows = (1 to 100).map(i => (0L, i <= 60)) ++ (1 to 100).map(i => (1L, i <= 40))
    val r = Experiments.abTest(rows.toDF("arm", "converted"),
      col("arm"), col("converted")).collect().head
    val (p1, p2, pool) = (0.6, 0.4, 0.5)
    val z = (p1 - p2) / math.sqrt(pool * (1 - pool) * (1.0 / 100 + 1.0 / 100))
    assert(math.abs(r.getAs[Double]("z") - z) < 1e-6)
    assert(r.getAs[Boolean]("significant"))
    assert(r.getAs[Double]("p_a") == 0.6 && r.getAs[Double]("p_b") == 0.4)
  }

  test("abTest degenerate pool (everyone converts) yields null z, not a crash") {
    val rows = Seq((0L, true), (0L, true), (1L, true))
    val r = Experiments.abTest(rows.toDF("arm", "converted"),
      col("arm"), col("converted")).collect().head
    assert(r.isNullAt(r.fieldIndex("z")))
    assert(!r.getAs[Boolean]("significant"))
  }

  test("basketRules: support, confidence, lift on a hand basket set") {
    // baskets: {a,b} ×3, {a} ×1, {b} ×1, {a,c} ×1  → N=6
    val bi = Seq(
      (1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"), (3L, "a"), (3L, "b"),
      (4L, "a"), (5L, "b"), (6L, "a"), (6L, "c")
    ).toDF("b", "i")
    val r = Experiments.basketRules(bi, col("b"), col("i"), minSupport = 1, topK = 10)
      .filter(col("item_a") === "a" && col("item_b") === "b").collect().head
    assert(r.getAs[Long]("n_ab") == 3L)
    assert(r.getAs[Double]("support") == 0.5) // 3/6
    assert(r.getAs[Double]("conf_a_to_b") == 0.6) // 3/5 baskets with a
    assert(r.getAs[Double]("conf_b_to_a") == 0.75) // 3/4 baskets with b
    assert(math.abs(r.getAs[Double]("lift") - 3.0 * 6 / (5 * 4)) < 1e-9)
  }

  test("eventTransitions: per-user lag counts and row-normalized probabilities") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:01"), "A", 1L), (1L, ts("2024-01-01 00:00:02"), "B", 2L),
      (1L, ts("2024-01-01 00:00:03"), "A", 3L), (1L, ts("2024-01-01 00:00:04"), "C", 4L),
      (2L, ts("2024-01-01 00:00:01"), "A", 5L), (2L, ts("2024-01-01 00:00:02"), "B", 6L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val r = Experiments.eventTransitions(ev, "user_id", "ts", "event_type", "event_id")
      .collect().map(x => (x.getString(0), x.getString(1)) -> ((x.getLong(2), x.getDouble(4))))
      .toMap
    assert(r(("A", "B"))._1 == 2L) // A→B twice of 3 A-departures
    assert(math.abs(r(("A", "B"))._2 - 2.0 / 3) < 1e-6)
    assert(r(("A", "C"))._1 == 1L)
    assert(r(("B", "A"))._1 == 1L)
    assert(!r.contains(("C", "A"))) // C is terminal
  }
}
