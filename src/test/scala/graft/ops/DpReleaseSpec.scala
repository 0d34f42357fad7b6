package graft.ops

import graft.SparkTestBase

class DpReleaseSpec extends SparkTestBase {
  private lazy val sp = spark
  import sp.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  private def hash60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(15), 16)
  private def unif(tag: String, seed: String, key: String): Double =
    (hash60(s"$seed#$tag#$key") + 1L).toDouble / math.pow(2, 60)
  private def r6(d: Double): Double =
    BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private val rows = Seq(
    ("web", "en"), ("web", "en"), ("web", "en"), ("web", "de"),
    ("books", "en"), ("books", "en"), ("arxiv", "en"))

  test("noisy counts replay the seeded Laplace chain exactly") {
    val got = DpRelease.laplaceCounts(
        rows.toDF("source", "lang"), Seq("source", "lang"), eps = 0.5, seed = "s1")
      .as[(String, String, Long, Double, Long)].collect()
      .map { case (s, l, n, nn, rn) => (s, l) -> (n, nn, rn) }.toMap
    val expected = rows.groupBy(identity).map { case ((s, l), g) =>
      val key = s"$s|$l"
      val noise = r6((math.log(unif("1", "s1", key)) -
        math.log(unif("2", "s1", key))) / 0.5)
      val noisy = r6(g.size + noise)
      (s, l) -> (g.size.toLong, noisy,
        math.max(0L, BigDecimal(noisy).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong))
    }
    assert(got == expected)
  }

  test("released values are clamped non-negative integers of the noisy value") {
    // eps = 0.01 → Laplace scale 100: small cells go negative and must clamp
    val got = DpRelease.laplaceCounts(
        rows.toDF("source", "lang"), Seq("source", "lang"), eps = 0.01, seed = "s2")
      .as[(String, String, Long, Double, Long)].collect()
    assert(got.forall(_._5 >= 0L))
    assert(got.exists(r => r._4 < 0 && r._5 == 0L),
      "expected at least one clamped cell at Laplace scale 100")
  }

  test("larger eps means less noise on the same seed") {
    def absNoise(eps: Double) = DpRelease.laplaceCounts(
        rows.toDF("source", "lang"), Seq("source", "lang"), eps, seed = "s1")
      .as[(String, String, Long, Double, Long)].collect()
      .map(r => math.abs(r._4 - r._3)).sum
    assert(absNoise(10.0) < absNoise(0.1))
  }

  test("non-positive eps raises") {
    intercept[IllegalArgumentException] {
      DpRelease.laplaceCounts(rows.toDF("source", "lang"), Seq("source"), 0.0, "s")
    }
  }
}
