package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class DataContractSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some(10.0), "A"), (2L, Some(-5.0), "B"),
    (3L, None, "A"), (3L, Some(7.0), "C")
  ).toDF("id", "amount", "cat")

  test("each check reports its exact counts and verdict") {
    import DataContract._
    val r = report(df, Seq(
      NotNull("amount_nn", col("amount")),
      Unique("id_unique", Seq(col("id"))),
      Satisfies("amount_pos", col("amount") > 0, minFrac = 0.5),
      RowCount("rows", 1, 10)))
      .collect().map(x => x.getString(0) -> ((x.getLong(2), x.getLong(3), x.getBoolean(5))))
      .toMap
    assert(r("amount_nn") == ((3L, 4L, false))) // one null
    assert(r("id_unique") == ((3L, 4L, false))) // id 3 duplicated
    assert(r("amount_pos") == ((2L, 4L, true))) // 2/4 >= 0.5
    assert(r("rows") == ((4L, 4L, true)))
  }

  test("a clean table passes every check") {
    import DataContract._
    val clean = Seq((1L, 1.0), (2L, 2.0)).toDF("id", "amount")
    val r = report(clean, Seq(
      NotNull("nn", col("amount")), Unique("u", Seq(col("id"))),
      Satisfies("pos", col("amount") > 0), RowCount("rc", 1, 100)))
    assert(r.filter(!col("ok")).count() == 0)
  }

  test("the contract is one scan: a single aggregate plus one distinct per Unique") {
    import DataContract._
    val r = report(df, Seq(NotNull("a", col("amount")),
      Satisfies("b", col("amount") > 0), RowCount("c", 1, 10)))
    r.collect()
    val plan = r.queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("ScalaUDF"))
  }

  test("benford on a power-law sample skews to digit 1 and matches hand chi2 terms") {
    val amounts = (1 to 300).map(i => (math.pow(1.05, i) * 100).toLong)
    val r = Experiments.benford(amounts.toDF("a"), col("a"))
      .collect().map(x => x.getInt(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
    assert(r(1)._1 > r(9)._1, s"power-law sample must favor digit 1: $r")
    assert(math.abs(r.values.map(_._2).sum - 1.0) < 1e-5)
  }

  test("ewmaDaily matches the recursive definition within the weight pin") {
    val ts = (d: Int) => java.sql.Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    // day counts: 3, 1, 2 (three days, events replicated per count)
    val ev = (Seq.fill(3)(1) ++ Seq.fill(1)(2) ++ Seq.fill(2)(3))
      .map(d => Tuple1(ts(d))).toDF("ts")
    val r = Experiments.ewmaDaily(ev, col("ts"))
      .collect().map(x => x.getLong(1) -> x.getDouble(2)).toMap
    val a = 0.3
    val s1 = 3.0
    val s2 = a * 1 + (1 - a) * s1
    val s3 = a * 2 + (1 - a) * s2
    assert(math.abs(r(3L) - s1) < 1e-9)
    assert(math.abs(r(1L) - s2) < 1e-9)
    assert(math.abs(r(2L) - s3) < 1e-9)
  }
}
