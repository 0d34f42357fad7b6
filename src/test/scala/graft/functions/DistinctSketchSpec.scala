package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DistinctSketchSpec extends SparkTestBase {
  private lazy val sp = spark
  import sp.implicits._

  /** Independent Scala recomputation of hash60 ('salt#' || item). */
  private def h60(salt: String, item: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$salt#$item".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  private def refRank(w: Long): Int =
    if (w == 0) 55 else java.lang.Long.numberOfTrailingZeros(w) + 1

  test("HLL registers match an independent md5/ctz recomputation cell for cell") {
    val items = (0 until 200).map(i => ("g", s"item$i"))
    val df = items.toDF("grp", "item")
    val regs = DistinctSketch.hllRegisters(df, col("grp"), col("item"), "t")
      .as[(String, Long, Int)].collect()
      .map { case (_, b, r) => b -> r }.toMap
    val expected = items
      .map { case (_, it) => h60("t", it) }
      .groupBy(h => h % 64)
      .map { case (b, hs) => b -> hs.map(h => refRank(h >> 6)).max }
    assert(regs == expected)
  }

  test("ranks stay in [1, 55] and buckets in [0, 64)") {
    val df = (0 until 5000).map(i => ("g", s"x$i")).toDF("grp", "item")
    val regs = DistinctSketch.hllRegisters(df, col("grp"), col("item"), "t")
      .as[(String, Long, Int)].collect()
    assert(regs.length <= 64)
    assert(regs.forall { case (_, b, r) => b >= 0 && b < 64 && r >= 1 && r <= 55 })
  }

  test("register-wise max merge is bit-identical to the single-corpus sketch") {
    val a = (0 until 300).map(i => ("a", s"doc$i"))
    val b = (150 until 450).map(i => ("b", s"doc$i")) // overlapping sets
    val perGrp = DistinctSketch.hllRegisters(
      (a ++ b).toDF("grp", "item"), col("grp"), col("item"), "t")
    val merged = DistinctSketch.hllMergeAll(perGrp)
      .as[(String, Long, Int)].collect().map { case (_, b2, r) => b2 -> r }.toMap
    val direct = DistinctSketch.hllRegisters(
      (a ++ b).map { case (_, it) => ("ALL", it) }.toDF("grp", "item"),
      col("grp"), col("item"), "t")
      .as[(String, Long, Int)].collect().map { case (_, b2, r) => b2 -> r }.toMap
    assert(merged == direct)
  }

  test("raw estimate lands within 3 standard errors (m=64 => ~13% per se) of truth") {
    val n = 5000
    val df = (0 until n).map(i => ("g", s"u-$i")).toDF("grp", "item")
    val est = DistinctSketch.hllSummary(
      DistinctSketch.hllRegisters(df, col("grp"), col("item"), "t"))
      .select(col("est")).as[Double].head()
    val se = 1.04 / math.sqrt(64) * n
    assert(math.abs(est - n) < 3 * se, s"est $est vs true $n (se $se)")
  }

  test("z_scaled is the exact scaled harmonic sum including empty buckets") {
    val df = Seq(("g", "only-item")).toDF("grp", "item")
    val (v, z) = DistinctSketch.hllSummary(
      DistinctSketch.hllRegisters(df, col("grp"), col("item"), "t"))
      .select(col("v_empty"), col("z_scaled")).as[(Int, Long)].head()
    val h = h60("t", "only-item")
    val rank = refRank(h >> 6)
    assert(v == 63)
    assert(z == 63L * (1L << 55) + (1L << (55 - rank)))
  }

  test("KMV sketch is exactly the k smallest distinct hashes per group") {
    val rows = (0 until 500).map(i => (s"s${i % 3}", s"it$i")) ++
      (0 until 500).map(i => (s"s${i % 3}", s"it$i")) // duplicates collapse
    val sk = DistinctSketch.kmvSketch(
      rows.toDF("grp", "item"), col("grp"), col("item"), k = 16, "t")
      .as[(String, Long)].collect().groupBy(_._1)
      .map { case (g, xs) => g -> xs.map(_._2).toVector }
    val expected = rows.distinct.groupBy(_._1).map { case (g, xs) =>
      g -> xs.map { case (_, it) => h60("t", it) }.distinct.sorted.take(16).toVector
    }
    assert(sk.view.mapValues(_.sorted).toMap == expected)
  }

  test("KMV sketch plans the bounded-heap operator, not a window sort") {
    val df = (0 until 100).map(i => (s"s${i % 2}", s"it$i")).toDF("grp", "item")
    val plan = DistinctSketch.kmvSketch(df, col("grp"), col("item"), 8, "t")
      .queryExecution.executedPlan.toString
    assert("TopKPerKey ".r.findAllIn(plan).size >= 2 && !plan.contains("Window"),
      s"expected two-stage TopKPerKey:\n$plan")
  }

  test("pair estimates are EXACT (union, jaccard, intersection) below sketch capacity") {
    // |A|=30, |B|=20, |A∩B|=10 — union 40 < k=64, so the union sketch is
    // the union set and the theta estimator degenerates to exact values
    val a = (0 until 30).map(i => ("A", s"common$i"))
    val b = (20 until 40).map(i => ("B", s"common$i"))
    val sk = DistinctSketch.kmvSketch(
      (a ++ b).toDF("grp", "item"), col("grp"), col("item"), k = 64, "t")
    val r = DistinctSketch.kmvPairEstimates(sk, 64)
      .select(col("source_a"), col("source_b"), col("kk"), col("n_both"),
        col("union_est"), col("jacc_est"), col("inter_est"))
      .as[(String, String, Int, Long, Double, Double, Double)].head()
    assert(r == (("A", "B", 40, 10L, 40.0, 0.25, 10.0)))
  }

  test("pair estimates approximate a large planted overlap within tolerance") {
    // |A|=|B|=4000, overlap 2000 => union 6000, jaccard 1/3
    val a = (0 until 4000).map(i => ("A", s"e$i"))
    val b = (2000 until 6000).map(i => ("B", s"e$i"))
    val sk = DistinctSketch.kmvSketch(
      (a ++ b).toDF("grp", "item"), col("grp"), col("item"), k = 64, "t")
    val (u, j) = DistinctSketch.kmvPairEstimates(sk, 64)
      .select(col("union_est"), col("jacc_est")).as[(Double, Double)].head()
    assert(math.abs(u - 6000) / 6000 < 0.5, s"union_est $u")
    assert(j > 0.1 && j < 0.6, s"jacc_est $j")
  }
}
