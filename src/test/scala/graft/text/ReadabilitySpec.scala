package graft.text

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Readability counting conventions and formula values, hand-checked. */
class ReadabilitySpec extends SparkTestBase {
  import spark.implicits._

  private def counts(s: String): (Int, Int, Int) =
    Seq(s).toDF("t").select(
        Readability.wordCount(col("t")),
        Readability.sentenceCount(col("t")),
        Readability.syllableCount(col("t")))
      .as[(Int, Int, Int)].head()

  test("word, sentence, and syllable counting conventions") {
    // 6 words; "..." and "!" are one terminator run each; syllables:
    // the(1) cat... sat(1+1) on(1) the(1) mat!(1) so(1) = wait — count:
    assert(counts("the cat sat. on the mat!") == (6, 2, 6))
    // terminator runs collapse: "!?!" is ONE sentence break
    assert(counts("wow!?! ok") == (2, 1, 2))
    // no terminator -> one sentence; consonant-only word floors at 1
    assert(counts("mhm pfft") == (2, 1, 2))
    // vowel groups: "beautiful" = eau + i + u = 3
    assert(counts("beautiful") == (1, 1, 3))
  }

  test("flesch and fk grade match hand-computed values") {
    val r = Seq(("a", 100, 5, 150)).toDF("id", "w", "s", "y")
      .select(
        Readability.fleschReadingEase(col("w"), col("s"), col("y")).as("f"),
        Readability.fkGrade(col("w"), col("s"), col("y")).as("g"))
      .as[(Double, Double)].head()
    // flesch = 206.835 - 1.015*20 - 84.6*1.5 = 59.635
    assert(math.abs(r._1 - 59.635) < 1e-9)
    // fk = 0.39*20 + 11.8*1.5 - 15.59 = 9.91
    assert(math.abs(r._2 - 9.91) < 1e-9)
  }

  test("row-local plan: no shuffle, no UDF") {
    val df = spark.range(10)
      .select(concat(lit("word one two. three"), col("id").cast("string")).as("t"))
      .select(Readability.wordCount(col("t")).as("w"),
        Readability.sentenceCount(col("t")).as("s"),
        Readability.syllableCount(col("t")).as("y"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("BatchEval"), plan)
  }
}
