package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkTestBase {
  private lazy val sp = spark
  import sp.implicits._

  test("planted verbatim 8-gram is reported with exact overlap counts") {
    val df = Seq(
      (0L, "a b c d e f g h i j"),            // benchmark (id % 20 == 0)
      (1L, "x y a b c d e f g h q"),          // shares the 8-gram "a b c d e f g h"
      (2L, "p q r s t u v w z1 z2 z3"),       // disjoint vocab -> clean
      (3L, "one two three")                   // < 8 tokens -> no grams at all
    ).toDF("doc_id", "text")
    val out = Decontaminate.ngramOverlap(df, "doc_id", "text",
      benchPred = col("doc_id") % 20 === 0, n = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // doc 1 has 4 distinct 8-grams (11 tokens), exactly one shared
    assert(out.keySet == Set(1L), s"unexpected contamination report: $out")
    assert(out(1L) == ((1L, 4L, 0.25)))
  }

  test("crossDupStats: shared spans counted symmetrically, unique docs report zero, short docs omitted") {
    val df = Seq(
      (0L, "a b c d e f g h i j"),      // shares "a b c d e f g h" with doc 1
      (1L, "x y a b c d e f g h q"),
      (2L, "p q r s t u v w z1 z2 z3"), // all grams unique to doc 2
      (3L, "one two three")             // < 8 tokens -> omitted
    ).toDF("doc_id", "text")
    val out = Decontaminate.crossDupStats(df, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out.keySet === Set(0L, 1L, 2L))
    assert(out(0L) === ((1L, 3L, math.round(1.0 / 3 * 1e6) / 1e6))) // 3 grams, 1 shared
    assert(out(1L) === ((1L, 4L, 0.25)))
    assert(out(2L) === ((0L, 4L, 0.0)))
  }

  test("benchmark n-gram set joins via broadcast (no corpus-sized shuffle)") {
    val df = (0L until 200L).map(i => (i, s"w${i % 7} a b c d e f g h w${i % 5} w${i % 3}"))
      .toDF("doc_id", "text")
    val plan = Decontaminate.ngramOverlap(df, "doc_id", "text",
      benchPred = col("doc_id") % 20 === 0).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"benchmark set not broadcast:\n$plan")
  }
}
