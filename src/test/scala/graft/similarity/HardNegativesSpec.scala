package graft.similarity

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class HardNegativesSpec extends SparkTestBase {
  private lazy val sp = spark
  import sp.implicits._

  private def mkVec(seed: Int): Array[Float] =
    Array.tabulate(8)(d => math.sin(seed * 8 + d + 1).toFloat)

  test("hard negatives exclude same-label vectors and self, rank by cosine") {
    val rows = (0 until 40).map(i => (i.toLong, mkVec(i), i % 3))
    val df = rows.toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(
        df.filter(col("vec_id") < 3), df, "vec_id", "embedding", "label", k = 5)
      .select("query_id", "neighbor_id", "rnk")
      .as[(Long, Long, Int)].collect()
    assert(got.length == 15)
    val labelOf = rows.map(r => r._1 -> r._3).toMap
    for ((q, nb, _) <- got) {
      assert(nb != q)
      assert(labelOf(nb) != labelOf(q), s"neighbor $nb shares label with query $q")
    }
    // ranks are 1..5 per query
    assert(got.groupBy(_._1).values.forall(_.map(_._3).sorted.toSeq == Seq(1, 2, 3, 4, 5)))
  }

  test("agrees with brute-force top-k restricted to different labels") {
    val rows = (0 until 30).map(i => (i.toLong, mkVec(i * 7), i % 2))
    val df = rows.toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(
        df.filter(col("vec_id") === 0), df, "vec_id", "embedding", "label", k = 3)
      .select("neighbor_id").as[Long].collect().toSet
    // brute force in scala
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      dot / (na * nb)
    }
    val q = rows.head
    val expected = rows.drop(1).filter(_._3 != q._3)
      .map(r => (r._1, BigDecimal(cos(q._2, r._2)).setScale(6, BigDecimal.RoundingMode.HALF_EVEN).toDouble))
      .sortBy { case (id, s) => (-s, id) }.take(3).map(_._1).toSet
    assert(got == expected)
  }
}
