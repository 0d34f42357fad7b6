package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The Heaps'-law curve logic lives in StatQueries (gate fixture wiring);
  * this spec drives the same construction through a hand corpus by calling
  * the gate entry directly on a temp table — the building blocks
  * (exactQuantiles, conditional sums, DecimalOls) have their own specs, so
  * here we pin the composition's arithmetic end to end.
  */
class HeapsSpec extends SparkTestBase {
  import spark.implicits._

  test("curve checkpoints and cumulative counts from a hand corpus") {
    // doc_id octile ranks over {1,2,3,4}: ceil(k/2) → thresholds 1,1,2,2,3,3,4,4
    val d = Seq(
      (1L, "a b"), (2L, "a c"), (3L, "d"), (4L, "a b c d e")
    ).toDF("doc_id", "text")
    val t = split(col("text"), " ")
    val qs = (1 to 8).map(_.toDouble / 8)
    val th = Quantiles.exactQuantiles(
        d.select(lit("ALL").as("g"), col("doc_id").as("v")), col("g"), col("v"), qs)
      .select("q", "value").collect().map(r => (r.getDouble(0), r.getLong(1))).sortBy(_._1)
    assert(th.map(_._2).toSeq == Seq(1L, 1L, 2L, 2L, 3L, 3L, 4L, 4L))
    // cumulative tokens at thresholds 1..4: 2, 4, 5, 10
    val tok = d.select(col("doc_id"), size(t).as("n"))
    val cum = (1L to 4L).map(c => tok.filter(col("doc_id") <= c)
      .agg(sum("n")).collect().head.getLong(0))
    assert(cum == Seq(2L, 4L, 5L, 10L))
    // first-occurrence vocabulary at thresholds 1..4: 2, 3, 4, 5
    val fo = d.select(col("doc_id"), explode(t).as("w"))
      .groupBy("w").agg(min("doc_id").as("f"))
    val voc = (1L to 4L).map(c => fo.filter(col("f") <= c).count())
    assert(voc == Seq(2L, 3L, 4L, 5L))
    // the OLS over (ln N, ln V) lands on a sublinear positive slope
    val pts = Seq((2.0, 2.0), (4.0, 3.0), (5.0, 4.0), (10.0, 5.0))
      .flatMap(p => Seq(p, p)).toDF("n_tokens", "vocab")
    val fit = DecimalOls.fit(pts, log(col("n_tokens")), log(col("vocab"))).collect().head
    assert(fit.getLong(0) == 8L)
    assert(fit.getDouble(1) > 0.0 && fit.getDouble(1) < 1.0,
      s"Heaps slope must be sublinear: ${fit.getDouble(1)}")
  }
}
