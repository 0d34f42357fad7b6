package graft.functions

import graft.SparkTestBase
import graft.similarity.Similarity
import org.apache.spark.sql.functions._

class CosineSimilaritySpec extends SparkTestBase {
  private lazy val sp = spark
  import sp.implicits._

  test("fused expression equals the composed zip_with/aggregate cosine bit-for-bit") {
    VectorExpressions.register(spark)
    val rows = (0 until 500).map { i =>
      (i.toLong,
        (0 until 64).map(d => math.sin(i * 64 + d)).toArray,
        (0 until 64).map(d => math.cos(i * 31 + d)).toArray)
    }
    val df = rows.toDF("id", "a", "b")
    val out = df.select(
      Similarity.cosine(col("a"), col("b")).as("composed"),
      Similarity.cosineFast(col("a"), col("b")).as("fused"))
      .collect()
    out.foreach { r =>
      // identical sequential double summation -> exactly equal
      assert(r.getDouble(0) == r.getDouble(1))
    }
  }

  test("null inputs yield null; works from SQL too") {
    VectorExpressions.register(spark)
    val df = Seq(
      (Some(Array(1.0, 0.0)), Some(Array(1.0, 0.0))),
      (None, Some(Array(1.0, 0.0)))
    ).toDF("a", "b")
    val got = df.select(Similarity.cosineFast(col("a"), col("b"))).collect()
    assert(got(0).getDouble(0) == 1.0)
    assert(got(1).isNullAt(0))
    df.createOrReplaceTempView("vecs")
    val sqlGot = spark.sql("SELECT graft_cosine(a, b) FROM vecs WHERE a IS NOT NULL").head()
    assert(sqlGot.getDouble(0) == 1.0)
  }

  test("expression participates in whole-stage codegen") {
    VectorExpressions.register(spark)
    // build arrays with array() (codegen-friendly, unlike transform's
    // lambda which is CodegenFallback) from range() so the optimizer can't
    // pre-evaluate locally
    val mk = (f: Int => org.apache.spark.sql.Column) => array((0 until 8).map(f): _*)
    val df = spark.range(1, 101)
      .select(
        mk(d => (col("id") + d).cast("double")).as("a"),
        mk(d => (col("id") * (d + 1)).cast("double")).as("b"))
      .select(Similarity.cosineFast(col("a"), col("b")).as("c"))
    // a codegen'd operator is prefixed "*(n)" in the executed plan
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project""".r.findFirstIn(plan).isDefined,
      s"expected codegen'd Project in:\n$plan")
    assert(df.filter(col("c").isNotNull).count() == 100)
  }
}
