package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MixtureTemperatureSpec extends SparkTestBase {
  private lazy val sp = spark
  import sp.implicits._

  test("temperature weights flatten the head and boost the tail, normalized") {
    val df = (Seq.fill(80)("en") ++ Seq.fill(15)("de") ++ Seq.fill(5)("yo"))
      .zipWithIndex.map { case (l, i) => (i.toLong, l, "w " * 10) }
      .toDF("id", "lang", "text")
    val got = Mixture.temperatureWeights(df, "lang", size(split(col("text"), " ")))
      .select("lang", "share", "weight").as[(String, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(math.abs(got.values.map(_._2).sum - 1.0) < 1e-5)
    // head damped, tail boosted
    assert(got("en")._2 < got("en")._1)
    assert(got("yo")._2 > got("yo")._1)
    // exact values: shares 0.8/0.15/0.05 of equal-length docs
    val sq = Map("en" -> math.sqrt(80.0), "de" -> math.sqrt(15.0), "yo" -> math.sqrt(5.0))
    val denom = sq.values.sum
    for ((l, (_, w)) <- got)
      assert(math.abs(w - sq(l) / denom) < 1e-6, s"lang $l")
  }
}
