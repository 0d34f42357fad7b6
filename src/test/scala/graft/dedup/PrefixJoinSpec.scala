package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class PrefixJoinSpec extends SparkTestBase {
  import spark.implicits._

  // planted near-dup cluster (0,1,2), an unrelated pair (3,4), singletons
  private def docs = Seq(
    (0L, "alpha beta gamma delta epsilon"),
    (1L, "alpha beta gamma delta zeta"),
    (2L, "alpha beta gamma delta epsilon"),
    (3L, "red green blue"),
    (4L, "red green blue yellow"),
    (5L, "one two three four five six"),
    (6L, "solitary")
  ).toDF("doc_id", "text")

  private def brute(n: Int, thr: Double) =
    Dedup.ngramJaccardPairs(docs.withColumn("blk", lit(1)), "doc_id", "text", "blk", n, thr)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(p => (p._1, p._2))

  private def prefix(n: Int, thr: Double) =
    PrefixJoin.jaccardPrefixJoin(docs, "doc_id", "text", n, thr)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(p => (p._1, p._2))

  test("prefix join equals exhaustive all-pairs at several thresholds (n=1)") {
    for (thr <- Seq(0.5, 0.6, 0.8, 0.9))
      assert(prefix(1, thr).toSeq == brute(1, thr).toSeq, s"thr=$thr")
  }

  test("prefix join equals exhaustive all-pairs on 2-gram shingles") {
    for (thr <- Seq(0.5, 0.75))
      assert(prefix(2, thr).toSeq == brute(2, thr).toSeq, s"thr=$thr")
  }

  test("boundary pair at sim exactly = t survives the prefix filter") {
    // J = 4/5 = 0.8 exactly: the double ceil(0.8·5) = 5 overshoot would
    // shorten doc 11's prefix to one rarest token and can lose the pair;
    // the integer form keeps it
    val pair = Seq(
      (10L, "w x y z"),
      (11L, "w x y z extra"),
      (12L, "completely different words here")
    ).toDF("doc_id", "text")
    val out = PrefixJoin.jaccardPrefixJoin(pair, "doc_id", "text", 1, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((10L, 11L, 0.8)))
  }

  test("exact duplicates at t = 1.0 (single-token prefixes) are found") {
    val out = prefix(1, 1.0)
    assert(out.toSeq == Seq((0L, 2L, 1.0)))
  }

  test("short docs below the shingle size drop out without error") {
    val d = Seq((0L, "a b"), (1L, "a b"), (2L, "x")).toDF("doc_id", "text")
    val out = PrefixJoin.jaccardPrefixJoin(d, "doc_id", "text", 3, 0.8).collect()
    assert(out.isEmpty)
  }

  test("rejects a threshold that is not a 6-dp decimal") {
    intercept[IllegalArgumentException] {
      PrefixJoin.jaccardPrefixJoin(docs, "doc_id", "text", 1, 0.1234567)
    }
  }

  test("persistent prefix screen: shuffle-free probe finds exactly the brute-force matches") {
    val base = docs.filter(col("doc_id") =!= 1L && col("doc_id") =!= 4L)
    val probe = docs.filter(col("doc_id") === 1L || col("doc_id") === 4L)
    val suffix = System.nanoTime()
    val index = PrefixJoin.persistentPrefixIndex(base, "doc_id", "text", 1, 0.6,
      s"prefix_spec_idx_$suffix")
    val out = PrefixJoin.screenAgainstPrefixIndex(index, probe, "doc_id", "text",
        1, 0.6, s"prefix_spec_probe_$suffix")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]), Option(r.get(3)).map(_.asInstanceOf[Long])))
      .sortBy(_._1)
    // doc 1 vs base: J(1,0)=J(1,2)=4/6=0.667 ≥ 0.6 (two matches, best ties
    // at the same sim → smallest base id 0); doc 4 vs doc 3: J=3/4=0.75
    assert(out.toSeq == Seq(
      (1L, 2L, Some(BigDecimal(4.0 / 6).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble), Some(0L)),
      (4L, 1L, Some(0.75), Some(3L))))
  }

  test("persistent prefix screen: no-match probes surface as (0, null, null)") {
    val base = docs.filter(col("doc_id") < 6L)
    val probe = docs.filter(col("doc_id") === 6L) // "solitary"
    val suffix = System.nanoTime()
    val index = PrefixJoin.persistentPrefixIndex(base, "doc_id", "text", 1, 0.8,
      s"prefix_spec_idx2_$suffix")
    val out = PrefixJoin.screenAgainstPrefixIndex(index, probe, "doc_id", "text",
        1, 0.8, s"prefix_spec_probe2_$suffix")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.isNullAt(2), r.isNullAt(3)))
    assert(out.toSeq == Seq((6L, 0L, true, true)))
  }
}
