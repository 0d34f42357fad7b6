package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SparseCorpusSpec extends SparkTestBase {
  import spark.implicits._

  private def axis(n: Int) = (0L until n.toLong).toSeq.toDF("doc_id")

  private def jaccard(a: String, b: String): Double = {
    val (sa, sb) = (a.split(" ").toSet, b.split(" ").toSet)
    sa.intersect(sb).size.toDouble / sa.union(sb).size
  }

  test("generation is deterministic and total over the id axis") {
    val t1 = SparseCorpus.generate(axis(60)).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val t2 = SparseCorpus.generate(axis(60)).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(t1 == t2)
    assert(t1.size == 60)
    val lens = t1.values.map(_.split(" ").length)
    assert(lens.min >= SparseCorpus.MIN_TOKENS &&
      lens.max < SparseCorpus.MIN_TOKENS + SparseCorpus.LEN_SPREAD)
  }

  test("planted structure: exact dup in every 5th block, near-dup members, sparse background") {
    val texts = SparseCorpus.generate(axis(200)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // blocks 0, 5 (blk % 5 == 0): member 2 is an unmutated exact copy
    assert(texts(2L) == texts(0L))
    assert(texts(102L) == texts(100L))
    // cluster members: high similarity to their base (allow Poisson spread
    // in the mutation count; 4 mutations at n=40 still leaves J ≈ 0.8)
    for (blk <- 0 until 10; r <- 1 to 2) {
      val j = jaccard(texts(blk * 20L), texts(blk * 20L + r))
      assert(j > 0.6, s"cluster member ${blk * 20 + r} too far from base: J=$j")
    }
    // at least one non-exact member actually mutated (P(none) ~ 1e-7)
    assert((0 until 10).exists(blk => texts(blk * 20L + 1) != texts(blk * 20L)))
    // background: unrelated docs are FAR apart — the crawl regime the
    // harness corpus can't represent
    val bg = for (a <- 3L to 19L; b <- 23L to 39L) yield jaccard(texts(a), texts(b))
    val sortedBg = bg.sorted
    val median = sortedBg(sortedBg.size / 2)
    assert(median < 0.15, s"background similarity not sparse: median J=$median")
  }

  test("oracle CTE chain rebuilds the identical corpus (spot-check via plan-free compare)") {
    // the cross-engine proof lives in the q_dedup_clusters_sparse gate;
    // here: the Spark generation only references doc_id (row-local, no
    // shuffle in the plan)
    val df = SparseCorpus.generate(axis(40))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sparse generation shuffled:\n$plan")
  }
}
