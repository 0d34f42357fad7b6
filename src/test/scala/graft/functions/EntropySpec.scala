package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Character-entropy expression: hand-computed values, code-point (not
  * UTF-16 unit) semantics, null handling, SQL registration, and the
  * whole-stage-codegen plan shape.
  */
class EntropySpec extends SparkTestBase {
  import spark.implicits._

  private def H(s: String): Double = {
    EntropyExpressions.register(spark)
    Seq(s).toDF("t")
      .select(EntropyExpressions.stringEntropy(col("t")).as("h"))
      .as[Double].head()
  }

  /** Naive reference: group code points, Σ −p·log2 p. */
  private def naive(s: String): Double = {
    val cps = s.codePoints().toArray
    if (cps.length <= 1) return 0.0
    val n = cps.length.toDouble
    cps.groupBy(identity).values.map(_.length / n)
      .map(p => -p * (math.log(p) / math.log(2.0))).sum
  }

  test("hand-computed values") {
    assert(H("") == 0.0)
    assert(H("x") == 0.0)
    assert(H("aaaa") == 0.0)
    assert(H("ab") == 1.0)
    assert(H("abcd") == 2.0)
    assert(math.abs(H("aab") - 0.9182958340544896) < 1e-12)
  }

  test("matches the naive per-code-point formula on seeded random strings") {
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 50) {
      val s = (1 to (1 + rnd.nextInt(300)))
        .map(_ => ('a' + rnd.nextInt(8)).toChar).mkString
      assert(math.abs(H(s) - naive(s)) < 1e-9, s)
    }
  }

  test("supplementary code points count once (code points, not UTF-16 units)") {
    // U+1D11E (musical G clef) is a surrogate pair in UTF-16
    val s = "𝄞𝄞a" // two clefs + one 'a' = 3 code points
    assert(math.abs(H(s) - naive(s)) < 1e-12)
    assert(math.abs(H(s) - 0.9182958340544896) < 1e-12)
  }

  test("null input yields null") {
    EntropyExpressions.register(spark)
    val r = Seq[Option[String]](None).toDF("t")
      .select(EntropyExpressions.stringEntropy(col("t")).as("h"))
      .collect().head
    assert(r.isNullAt(0))
  }

  test("SQL registration and whole-stage codegen, no UDF node") {
    EntropyExpressions.register(spark)
    assert(spark.sql("SELECT graft_entropy('abab') AS h").head().getDouble(0) == 1.0)
    val df = spark.range(4)
      .select(EntropyExpressions.stringEntropy(
        concat(lit("ab"), col("id").cast("string"))).as("h"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"no WholeStageCodegen stage in:\n$plan")
    assert(!plan.contains("BatchEval"), s"UDF node present:\n$plan")
  }

  test("non-string input is a type-check failure") {
    EntropyExpressions.register(spark)
    intercept[Exception] { spark.sql("SELECT graft_entropy(42)").collect() }
  }
}
