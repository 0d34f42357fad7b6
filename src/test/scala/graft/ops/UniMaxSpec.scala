package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class UniMaxSpec extends SparkTestBase {
  import spark.implicits._

  // per-lang token counts via one doc per lang with n_tokens single-space words
  private def corpus(counts: (String, Int)*) =
    counts.toSeq.toDF("lang", "n").select(col("lang"),
      array_join(transform(sequence(lit(1), col("n")), _ => lit("w")), " ").as("text"))

  private def run(counts: Seq[(String, Int)], budget: Long, e: Int = 1) =
    UniMax.allocate(corpus(counts: _*), "lang", size(split(col("text"), " ")),
      budget, maxEpochs = e)
      .collect().map(r => r.getString(0) -> ((r.getBoolean(3), r.getDouble(4)))).toMap

  test("water-filling: small languages cap, the rest share the level") {
    // caps (E=1): a 10, b 20, c 100; B = 60
    // a: 10*3 + 0 = 30 <= 60 → capped; b: 20*2 + 10 = 50 <= 60 → capped;
    // c: 100*1 + 30 = 130 > 60 → level t = (60 - 30) / 1 = 30
    val out = run(Seq("a" -> 10, "b" -> 20, "c" -> 100), budget = 60)
    assert(out("a") == ((true, 10.0)) && out("b") == ((true, 20.0)))
    assert(out("c") == ((false, 30.0)))
  }

  test("fractional water level splits evenly with 6-dp pin") {
    // caps: a 3, b 100, c 100; B = 10 → a capped (3*3=9<=10);
    // t = (10-3)/2 = 3.5 for b and c
    val out = run(Seq("a" -> 3, "b" -> 100, "c" -> 100), budget = 10)
    assert(out("a")._1 && out("b") == ((false, 3.5)) && out("c") == ((false, 3.5)))
  }

  test("budget above total caps: everything capped, surplus unallocated") {
    val out = run(Seq("a" -> 5, "b" -> 7), budget = 1000)
    assert(out == Map("a" -> ((true, 5.0)), "b" -> ((true, 7.0))))
  }

  test("nobody capped: pure uniform split") {
    val out = run(Seq("a" -> 50, "b" -> 60), budget = 40)
    assert(out("a") == ((false, 20.0)) && out("b") == ((false, 20.0)))
  }

  test("maxEpochs scales the caps; epochs column reports alloc/available") {
    // E=2: caps a 20, b 200; B = 50 → a capped (20*2+0=40<=50),
    // b gets 30 → epochs: a 2.0, b 0.3
    val rows = UniMax.allocate(corpus("a" -> 10, "b" -> 100), "lang",
        size(split(col("text"), " ")), budget = 50, maxEpochs = 2)
      .collect().map(r => r.getString(0) -> ((r.getDouble(4), r.getDouble(5)))).toMap
    assert(rows("a") == ((20.0, 2.0)) && rows("b") == ((30.0, 0.3)))
  }

  test("equal caps are all-or-none: below total none cap, at total all cap") {
    // equal caps share one water level, so a tie can never straddle the cut
    val below = run(Seq("c" -> 10, "a" -> 10, "b" -> 10), budget = 25)
    assert(below.values.forall(!_._1))
    assert(below.values.forall(_._2 == BigDecimal(25.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    val at = run(Seq("c" -> 10, "a" -> 10, "b" -> 10), budget = 30)
    assert(at.values.forall(_._1) && at.values.forall(_._2 == 10.0))
  }
}
