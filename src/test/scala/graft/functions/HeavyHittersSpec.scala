package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkTestBase {
  private lazy val sp = spark
  import sp.implicits._

  private def mgRun(k: Int, stream: Seq[String]): Map[String, Long] = {
    val mg = new HeavyHitters.MisraGries(k)
    stream.foldLeft(mg.zero)(mg.reduce)
  }

  test("MG sketch: superset guarantee — every token with freq > n/(k+1) survives") {
    // adversarial stream: heavy token interleaved with a churn of singletons
    val heavy = Seq.fill(40)("hh")
    val churn = (0 until 160).map(i => s"t$i")
    val stream = heavy.zipAll(churn, "hh", "pad").flatMap { case (a, b) => Seq(a, b) }
    val n = stream.size
    val k = 9
    val buf = mgRun(k, stream)
    val trueCounts = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for ((t, c) <- trueCounts if c > n.toDouble / (k + 1))
      assert(buf.contains(t), s"token $t freq $c > n/(k+1) missing from sketch")
  }

  test("MG merge: associative combine keeps the guarantee across partitions") {
    val mg = new HeavyHitters.MisraGries(5)
    val partA = Seq.fill(30)("x") ++ (0 until 40).map(i => s"a$i")
    val partB = Seq.fill(25)("x") ++ (0 until 40).map(i => s"b$i")
    val merged = mg.merge(mgRun(5, partA), mgRun(5, partB))
    // x has freq 55 of n=135 > 135/6 = 22.5 → must survive the merge
    assert(merged.contains("x"))
    assert(merged.size <= 5)
  }

  test("exactHeavyHitters equals the brute-force answer on a skewed corpus") {
    val docs = (0 until 200).map { i =>
      val common = if (i % 2 == 0) "alpha alpha beta" else "alpha gamma"
      val rare = s"rare$i"
      (i.toLong, s"$common $rare")
    }.toDF("doc_id", "text")
    val got = HeavyHitters.exactHeavyHitters(docs, split(col("text"), " "),
        sketchK = 49, denom = 20)
      .as[(String, Long)].collect().toMap
    val toks = docs.select(explode(split(col("text"), " ")).as("t"))
    val n = toks.count()
    val expected = toks.groupBy("t").count().as[(String, Long)].collect()
      .filter { case (_, c) => c * 20 > n }.toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("denom above sketchK+1 is rejected (would break exactness)") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      HeavyHitters.exactHeavyHitters(docs, split(col("text"), " "),
        sketchK = 9, denom = 11)
    }
  }
}
