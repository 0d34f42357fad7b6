package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class KAnonymitySpec extends SparkTestBase {
  import spark.implicits._

  test("violating groups and records-at-risk count exactly") {
    // stratum A: group (1,x) has 3 records (< 5, at risk), group (2,y) has 5
    // stratum B: one group of 6 — anonymous
    val df = (Seq.fill(3)(("A", 1, "x")) ++ Seq.fill(5)(("A", 2, "y")) ++
      Seq.fill(6)(("B", 3, "z"))).toDF("s", "q1", "q2")
    val r = KAnonymity.report(df, col("s"), Seq(col("q1"), col("q2")), k = 5)
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5), x.getBoolean(7))))
      .toMap
    assert(r("A") == ((2L, 8L, 1L, 3L, 3L, false)))
    assert(r("B") == ((1L, 6L, 0L, 0L, 6L, true)))
  }

  test("CMS join-size estimate never underestimates and is exact without collisions") {
    import graft.functions.CountMin
    val a = Seq("k1", "k1", "k2").toDF("k")
    val b = Seq("k1", "k2", "k2", "k3").toDF("k")
    // wide sketch → no collisions → est == exact = 2*1 + 1*2 = 4
    val skA = CountMin.sketch(a, array(col("k")), 3, 1024)
    val skB = CountMin.sketch(b, array(col("k")), 3, 1024)
    assert(CountMin.joinSizeEstimate(skA, skB, 3, 1024).collect().head.getLong(0) == 4L)
    // narrow sketch → collisions only inflate
    val nA = CountMin.sketch(a, array(col("k")), 3, 2)
    val nB = CountMin.sketch(b, array(col("k")), 3, 2)
    assert(CountMin.joinSizeEstimate(nA, nB, 3, 2).collect().head.getLong(0) >= 4L)
  }
}
