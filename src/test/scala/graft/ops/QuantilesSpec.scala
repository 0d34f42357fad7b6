package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Exact-quantile refinement vs the sort-based truth, across bucket counts
  * that force deep multi-round narrowing, plus the threshold-filter
  * composition and its no-sort/no-window plan shape.
  */
class QuantilesSpec extends SparkTestBase {
  import spark.implicits._

  /** Sort-based rank-r truth: r = max(1, ceil(q·n)), 1-indexed. */
  private def truth(vs: Seq[Long], q: Double): Long = {
    val sorted = vs.sorted
    val r = math.max(1L, math.ceil(q * vs.size).toLong)
    sorted((r - 1).toInt)
  }

  private val qs = Seq(0.01, 0.25, 0.5, 0.9, 0.99, 1.0)

  test("matches sort-based quantiles on seeded random data, grouped") {
    val rnd = new scala.util.Random(42)
    val data = (1 to 5000).map { i =>
      val g = s"g${i % 3}"
      val v = rnd.nextLong() % 1000000007L // negatives included
      (g, v)
    }
    val df = data.toDF("g", "v").repartition(7)
    val got = Quantiles.exactQuantiles(df, col("g"), col("v"), qs)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(4)).toMap
    for (g <- Seq("g0", "g1", "g2"); q <- qs) {
      val vs = data.collect { case (`g`, v) => v }
      assert(got((g, q)) == truth(vs, q), s"group $g q=$q")
    }
  }

  test("tiny bucket count forces many rounds and stays exact") {
    val rnd = new scala.util.Random(7)
    val vs = (1 to 200).map(_ => math.abs(rnd.nextLong() >> 1))
    val df = vs.map(("a", _)).toDF("g", "v")
    val got = Quantiles.exactQuantiles(df, col("g"), col("v"), Seq(0.5), buckets = 2)
      .collect().head.getLong(4)
    assert(got == truth(vs, 0.5))
  }

  test("full 64-bit span: extreme negative and positive values") {
    val vs = Seq(Long.MinValue + 1, -7L, 0L, 3L, Long.MaxValue - 1, Long.MaxValue)
    val df = vs.map(("a", _)).toDF("g", "v")
    val got = Quantiles.exactQuantiles(df, col("g"), col("v"), Seq(0.5, 1.0))
      .collect().map(r => r.getDouble(1) -> r.getLong(4)).toMap
    assert(got(0.5) == truth(vs, 0.5))
    assert(got(1.0) == Long.MaxValue)
  }

  test("rank and n columns are exact; q=tiny clamps to rank 1 (the min)") {
    val df = Seq(("a", 10L), ("a", 20L), ("a", 30L)).toDF("g", "v")
    val r = Quantiles.exactQuantiles(df, col("g"), col("v"), Seq(0.0001)).collect().head
    assert(r.getLong(2) == 1L && r.getLong(3) == 3L && r.getLong(4) == 10L)
  }

  test("nulls are ignored like SQL aggregates; empty group absent") {
    val df = Seq(("a", Some(5L)), ("a", None), ("a", Some(1L)), ("b", None))
      .toDF("g", "v")
    val rows = Quantiles.exactQuantiles(df, col("g"), col("v"), Seq(1.0)).collect()
    assert(rows.length == 1)
    assert(rows.head.getString(0) == "a" && rows.head.getLong(3) == 2L
      && rows.head.getLong(4) == 5L)
  }

  test("single-value and single-row groups resolve without a scan round") {
    val df = Seq(("a", 7L), ("a", 7L), ("b", 42L)).toDF("g", "v")
    val got = Quantiles.exactQuantiles(df, col("g"), col("v"), Seq(0.5, 1.0))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(4)).toMap
    assert(got(("a", 0.5)) == 7L && got(("b", 1.0)) == 42L)
  }

  test("filterAboveQuantile keeps exactly the rows at/above the group p-quantile") {
    val data = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L),
      ("b", 10L), ("b", 20L))
    val df = data.toDF("g", "v")
    // p25 of a = value at rank ceil(.25*4)=1 -> 1; all of a kept.
    // p25 of b = rank ceil(.25*2)=1 -> 10; both kept. p75 of a -> rank 3 -> 3.
    val kept25 = Quantiles.filterAboveQuantile(df, col("g"), col("v"), 0.25)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(kept25 == data.toSet)
    val kept75 = Quantiles.filterAboveQuantile(df, col("g"), col("v"), 0.75)
      .as[(String, Long)].collect().toSet
    assert(kept75 == Set(("a", 3L), ("a", 4L), ("b", 20L)))
  }

  test("threshold filter plan has no sort, window, or join over data rows") {
    val df = (1 to 100).map(i => (s"g${i % 2}", i.toLong)).toDF("g", "v")
    val filtered = Quantiles.filterAboveQuantile(df, col("g"), col("v"), 0.5)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(!plan.contains("Sort") && !plan.contains("Window")
      && !plan.toLowerCase.contains("join"), plan)
  }

  test("percentile_approx is the documented production swap: rank error within bound") {
    // The exact operator is for when the answer must be exact (thresholds
    // feeding bit-reproducible gates); Spark's built-in percentile_approx
    // (GK sketch, mergeable, one pass) is the swap when an ε-rank answer
    // is enough. Contract checked here: at accuracy A, the returned value's
    // RANK is within n/A + 1 of the target rank.
    val rnd = new scala.util.Random(99)
    val vs = (1 to 20000).map(_ => rnd.nextInt(1000000).toLong)
    val df = vs.map(("a", _)).toDF("g", "v")
    val acc = 1000
    for (q <- Seq(0.5, 0.9, 0.99)) {
      val approx = df.agg(percentile_approx(col("v"), lit(q), lit(acc)))
        .head().getLong(0)
      val sorted = vs.sorted
      val targetRank = math.max(1L, math.ceil(q * vs.size).toLong)
      val approxRank = sorted.count(_ <= approx)
      assert(math.abs(approxRank - targetRank) <= vs.size / acc + 1,
        s"q=$q approx=$approx rank=$approxRank target=$targetRank")
    }
  }

  test("invalid fractions and bucket counts fail loudly") {
    val df = Seq(("a", 1L)).toDF("g", "v")
    intercept[IllegalArgumentException] {
      Quantiles.exactQuantiles(df, col("g"), col("v"), Seq(0.0))
    }
    intercept[IllegalArgumentException] {
      Quantiles.exactQuantiles(df, col("g"), col("v"), Seq(0.5), buckets = 1)
    }
  }
}
