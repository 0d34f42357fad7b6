package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkTestBase {
  private lazy val sp = spark
  import sp.implicits._

  private val D = 3
  private val W = 16

  private def docsDF(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")

  private def estimates(docs: org.apache.spark.sql.DataFrame,
      queries: Seq[String]): Map[String, Long] = {
    val sk = CountMin.sketch(docs, split(col("text"), " "), D, W)
    val q = queries.toDF("token")
    CountMin.estimate(sk, q, "token", D, W).as[(String, Long)].collect().toMap
  }

  test("one-sided error: estimate >= exact count for every token, == without collisions") {
    val docs = docsDF(Seq(
      (0L, "a a a b"), (1L, "b c"), (2L, "a d d d d")))
    val exact = Map("a" -> 4L, "b" -> 2L, "c" -> 1L, "d" -> 4L)
    val est = estimates(docs, exact.keys.toSeq)
    for ((t, c) <- exact)
      assert(est(t) >= c, s"token $t estimated ${est(t)} below exact $c")
    // 4 distinct tokens in 16 buckets x 3 rows: some row separates each
    // pair unless md5 collides on every row — with this fixture it doesn't,
    // so min over rows recovers the exact count
    assert(est == exact)
  }

  test("unseen token estimates 0 (or a collision overestimate, never negative)") {
    val docs = docsDF(Seq((0L, "x y z")))
    val est = estimates(docs, Seq("absent"))
    assert(est("absent") >= 0L)
  }

  test("merge of shard sketches equals the sketch of the concatenated corpus") {
    val shardA = docsDF((0 until 30).map(i => (i.toLong, s"t${i % 5} t${i % 3}")))
    val shardB = docsDF((30 until 60).map(i => (i.toLong, s"t${i % 7} hot hot")))
    val whole = shardA.unionByName(shardB)
    val merged = CountMin.merge(
      CountMin.sketch(shardA, split(col("text"), " "), D, W),
      CountMin.sketch(shardB, split(col("text"), " "), D, W))
    val direct = CountMin.sketch(whole, split(col("text"), " "), D, W)
    val m = merged.as[(Int, Long, Long)].collect().toSet
    val d = direct.as[(Int, Long, Long)].collect().toSet
    assert(m == d)
  }

  test("collisions force an overestimate when width is saturated") {
    // 40 distinct tokens in a 2-wide sketch: every bucket is shared, so
    // every estimate strictly exceeds every exact singleton count
    val docs = docsDF((0 until 40).map(i => (i.toLong, s"tok$i")))
    val sk = CountMin.sketch(docs, split(col("text"), " "), 2, 2)
    val q = (0 until 40).map(i => s"tok$i").toDF("token")
    val est = CountMin.estimate(sk, q, "token", 2, 2).as[(String, Long)].collect()
    assert(est.forall(_._2 > 1L))
  }

  test("sketch axis is bounded by d*w and the estimate probe side broadcasts") {
    val docs = docsDF((0 until 100).map(i => (i.toLong, s"w${i % 37} w${i % 11}")))
    val sk = CountMin.sketch(docs, split(col("text"), " "), D, W)
    assert(sk.count() <= D.toLong * W)
    val q = Seq("w0", "w1").toDF("token")
    val plan = CountMin.estimate(sk, q, "token", D, W)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"), plan)
  }
}
