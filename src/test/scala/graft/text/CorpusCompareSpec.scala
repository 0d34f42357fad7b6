package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class CorpusCompareSpec extends SparkTestBase {
  import spark.implicits._

  // two sources with a hand-checkable distribution:
  //   A: "x x y"  (x:2, y:1, T_A=3)
  //   B: "y y z"  (y:2, z:1, T_B=3)
  // corpus: x:2, y:3, z:1, T=6
  private lazy val docs = Seq(
    ("A", "x x y"), ("B", "y y z")
  ).toDF("source", "text")

  test("sourceKl matches the hand-computed divergence") {
    def kl(parts: Seq[(Long, Long)], ts: Long, t: Long): Double =
      parts.map { case (c, cw) =>
        (c.toDouble / ts) * math.log(c.toDouble * t / (cw.toDouble * ts))
      }.sum
    val want = Map(
      "A" -> kl(Seq((2L, 2L), (1L, 3L)), 3, 6),
      "B" -> kl(Seq((2L, 3L), (1L, 1L)), 3, 6))
    val got = CorpusCompare.sourceKl(docs, col("source"), col("text"))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    want.foreach { case (s, v) => assert(math.abs(got(s) - v) < 1e-5, s"$s: ${got(s)} vs $v") }
  }

  test("identical sources have zero KL") {
    val same = Seq(("A", "x y z"), ("B", "x y z")).toDF("source", "text")
    val got = CorpusCompare.sourceKl(same, col("source"), col("text"))
      .collect().map(_.getDouble(3))
    assert(got.forall(_ == 0.0))
  }

  test("keyness ranks the source-exclusive word first and skips underrepresented") {
    val d2 = Seq(
      ("A", "x x x y common common"), ("B", "z z z y common common")
    ).toDF("source", "text")
    val top = CorpusCompare.keynessG2(d2, col("source"), col("text"), 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(5)))
    // x is exclusive to A, z exclusive to B → rank 1 in each
    assert(top.contains(("A", "x", 1)) && top.contains(("B", "z", 1)))
    // 'common' and 'y' are evenly spread → never overrepresented
    assert(!top.exists(t => t._2 == "common" || t._2 == "y"))
  }

  test("G² of an exclusive word matches the closed form") {
    // A: a=3 x's of cw=3, ts=6, t=12 → b=0, c2=3, d=6
    val d2 = Seq(
      ("A", "x x x y common common"), ("B", "z z z y common common")
    ).toDF("source", "text")
    def cell(o: Double, row: Double, colTot: Double, t: Double) =
      if (o > 0) o * math.log(o * t / (row * colTot)) else 0.0
    val want = 2.0 * (cell(3, 3, 6, 12) + cell(3, 9, 6, 12) + cell(6, 9, 6, 12))
    val g2 = CorpusCompare.keynessG2(d2, col("source"), col("text"), 1)
      .filter(col("source") === "A").collect().head.getDouble(4)
    assert(math.abs(g2 - want) < 1e-4, s"$g2 vs $want")
  }
}
