package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.text.Normalize

/** UnicodeNormalize expression + the CCNet fold built on it. */
class StringExpressionsSpec extends SparkTestBase {
  import spark.implicits._

  test("NFC composes decomposed sequences; ASCII passes through untouched") {
    val df = Seq(
      (1L, "Cafe\u0301"),  // decomposed: 5 codepoints
      (2L, "d\u00e9j\u00e0"),  // precomposed already
      (3L, "plain ascii")
    ).toDF("id", "s")
    val out = df.select(col("id"), Normalize.nfc(df, col("s")).as("n"),
        length(Normalize.nfc(df, col("s"))).as("len"))
      .orderBy("id").collect()
    assert(out(0).getString(1) === "Caf\u00e9" && out(0).getInt(2) === 4)
    assert(out(1).getString(1) === "d\u00e9j\u00e0")
    assert(out(2).getString(1) === "plain ascii")
  }

  test("foldText: accent-strip, lowercase, whitespace collapse, trim") {
    val df = Seq((1L, "  Cafe\u0301   NAI\u0308VE  M\u00dcNCHEN ")).toDF("id", "s")
    val out = df.select(Normalize.foldText(df, col("s"))).head().getString(0)
    assert(out === "cafe naive munchen")
  }

  test("decomposed and precomposed variants fold to the same dedup key") {
    val df = Seq((1L, "Cafe\u0301"), (2L, "Caf\u00e9"), (3L, "cafe"))
      .toDF("id", "s")
    val keys = df.select(Normalize.foldText(df, col("s"))).collect().map(_.getString(0))
    assert(keys.distinct.length === 1)
  }

  test("expression stays inside whole-stage codegen — no UDF eval node") {
    // spark.range leaf: a local Seq constant-folds to LocalTableScan and
    // hides the codegen question entirely
    val df = spark.range(64)
      .select(col("id"), concat(lit("Café doc "), col("id").cast("string")).as("s"))
    val plan = df.select(Normalize.nfc(df, col("s")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"no WholeStageCodegen stage in:\n$plan")
    assert(!plan.contains("BatchEval"), s"UDF node present:\n$plan")
  }

  test("registered for SQL use; invalid form fails loudly") {
    StringExpressions.register(spark)
    val r = spark.sql("SELECT graft_normalize('Cafe\u0301', 'NFC') AS n").head().getString(0)
    assert(r === "Caf\u00e9")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_normalize('x', 'NFX')").collect()
    }
    assert(e.getMessage.toLowerCase.contains("nfx") ||
      e.getMessage.toLowerCase.contains("form"))
  }
}
