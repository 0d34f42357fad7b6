package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** A-ES weighted sampling: exact key replay against a driver-side md5
  * recomputation, weight-proportional inclusion, determinism, and the
  * loud-failure weight contract.
  */
class WeightedSampleSpec extends SparkTestBase {
  import spark.implicits._

  /** Driver-side replay of hash60('salt#id') — md5 hex prefix, 60 bits. */
  private def h60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  private def esKey(id: String, w: Double, seed: String): Double =
    math.log((h60(s"$seed#$id") + 1).toDouble / math.pow(2, 60)) / w

  test("es_key column equals the driver-side A-ES formula") {
    val df = Seq((7L, 3L), (11L, 5L)).toDF("id", "w")
    val got = df.select(col("id"),
        WeightedSample.esKey(col("id"), col("w"), "t").as("k"))
      .as[(Long, Double)].collect().toMap
    assert(got(7L) == esKey("7", 3.0, "t"))
    assert(got(11L) == esKey("11", 5.0, "t"))
  }

  test("selection is the k largest keys, ties impossible, ids returned intact") {
    val df = (1L to 50L).map(i => (i, 1L + i % 3)).toDF("id", "w")
    val sel = WeightedSample.sampleByWeight(df, col("id"), col("w"), 10, "s")
      .as[(Long, Long, Double)].collect()
    assert(sel.length == 10)
    val expected = (1L to 50L)
      .map(i => (i, esKey(i.toString, (1 + i % 3).toDouble, "s")))
      .sortBy { case (i, k) => (-k, i) }.take(10).map(_._1).toSet
    assert(sel.map(_._1).toSet == expected)
  }

  test("inclusion probability tracks weight: heavy rows dominate the sample") {
    // weight 9 vs 1 in equal numbers; a 10% sample should be mostly heavy
    val df = (1L to 2000L).map(i => (i, if (i % 2 == 1) 9L else 1L)).toDF("id", "w")
    val sel = WeightedSample.sampleByWeight(df, col("id"), col("w"), 200, "p")
      .as[(Long, Long, Double)].collect()
    val heavyFrac = sel.count(_._2 == 9L).toDouble / sel.length
    assert(heavyFrac > 0.75 && heavyFrac < 0.98, s"heavy fraction $heavyFrac")
  }

  test("same seed reproduces the set; a different seed changes it") {
    val df = (1L to 300L).map(i => (i, 1L + (i % 7))).toDF("id", "w")
    def ids(seed: String) =
      WeightedSample.sampleByWeight(df, col("id"), col("w"), 30, seed)
        .select("id").as[Long].collect().toSet
    assert(ids("a") == ids("a"))
    assert(ids("a") != ids("b"))
  }

  test("k beyond the population returns every row") {
    val df = Seq((1L, 2L), (2L, 2L)).toDF("id", "w")
    assert(WeightedSample.sampleByWeight(df, col("id"), col("w"), 10, "x")
      .count() == 2)
  }

  test("streamed reservoir equals the one-shot batch sample row for row") {
    import graft.text.TextFunctions
    val dir = "/root/testdata/sf0.001"
    val batch = WeightedSample.sampleByWeight(
        spark.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("source"),
            TextFunctions.bpeTokenCount(col("text")).cast("long").as("weight")),
        col("doc_id"), col("weight"), 25, "spec")
      .collect().map(r => (r.getLong(0), r.getDouble(3))).sortBy(_._1)
    val streamed = graft.streaming.StreamingOps
      .streamWeightedSample(spark, dir, 25, "spec", queryName = "spec_wsample")
      .collect().map(r => (r.getLong(0), r.getDouble(3))).sortBy(_._1)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("non-positive or null weight fails loudly with the offending id") {
    val df = Seq((1L, 2L), (2L, 0L)).toDF("id", "w")
    val e = intercept[Exception] {
      WeightedSample.sampleByWeight(df, col("id"), col("w"), 1, "x").collect()
    }
    assert(e.getMessage.contains("non-positive weight") ||
      e.getCause != null && e.getCause.getMessage.contains("non-positive weight"))
  }
}
