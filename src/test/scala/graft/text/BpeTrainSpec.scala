package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class BpeTrainSpec extends SparkTestBase {
  import spark.implicits._

  test("pairCounts weights adjacent char pairs by word frequency") {
    // "low" x3 and "lower" x1: pair "l o" occurs in both -> 3 + 1 = 4
    val df = Seq((1L, "low low low lower")).toDF("doc_id", "text")
    val pc = BpeTrain.pairCounts(BpeTrain.wordSymbols(df, "text"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pc("l o") == 4L)
    assert(pc("o w") == 4L)
    assert(pc("w e") == 1L)
    assert(pc("e r") == 1L)
  }

  test("applyMerge is left-to-right non-overlapping") {
    val df = Seq(("aaa", 1L)).toDF("w", "cnt").withColumn("cs", split(col("w"), ""))
    val out = df.select(BpeTrain.applyMerge(col("cs"), "a", "a")).as[Seq[String]].head()
    assert(out == Seq("aa", "a"))
  }

  test("learnMerges reproduces the classic low/lower/newest example") {
    // Sennrich-style toy corpus: "es" dominates, then "est"
    val df = Seq((1L, ("newest " * 6 + "widest " * 3).trim)).toDF("doc_id", "text")
    val merges = BpeTrain.learnMerges(df, "text", 2)
    assert(merges == Seq("e s", "es t"))
  }

  test("encodePerDoc counts post-merge symbols per document") {
    // merges (e s) then (es t): "newest" = n e w es t -> n e w est (4),
    // "widest" = w i d est (4), "a" stays 1 symbol
    val df = Seq(
      (1L, ("newest " * 6 + "widest " * 3).trim),
      (2L, "newest a")
    ).toDF("doc_id", "text")
    val merges = BpeTrain.learnMerges(df, "text", 2)
    val out = BpeTrain.encodePerDoc(df, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((9L, 9L * 4)))
    assert(out(2L) == ((2L, 4L + 1)))
  }

  test("encodePerDoc with no merges counts raw characters") {
    val df = Seq((1L, "ab cde")).toDF("doc_id", "text")
    val out = BpeTrain.encodePerDoc(df, "doc_id", "text", Nil).collect().head
    assert(out.getLong(1) == 2 && out.getLong(2) == 5)
  }

  test("mergeStepTopPairs applies the winning merge before recounting") {
    val df = Seq((1L, ("newest " * 6 + "widest " * 3).trim)).toDF("doc_id", "text")
    val after = BpeTrain.mergeStepTopPairs(df, "text", k = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // "e s" merged into "es" everywhere: the new top pair is "es t" (9)
    assert(after("es t") == 9L)
    assert(!after.contains("e s"))
    val plan = BpeTrain.mergeStepTopPairs(df, "text", k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"top-k is a global sort:\n$plan")
  }
}
