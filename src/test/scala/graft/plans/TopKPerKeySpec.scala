package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Custom whole-operator extension: per-key top-k via bounded heaps. */
class TopKPerKeySpec extends SparkTestBase {
  import spark.implicits._

  // deterministic pseudo-random rows: 40 keys × ~50 rows, total order via
  // (score desc, id asc)
  private def data = spark.range(2000)
    .select(col("id"), (col("id") % 40).as("key"),
      pmod(col("id") * 2654435761L, lit(104729L)).cast("double").as("score"))

  test("equals the window row_number formulation row for row") {
    val viaOp = TopKPerKey(data, Seq("key"), Seq(("score", false), ("id", true)), 5)
      .collect().map(_.toSeq).toSet
    val viaWindow = data
      .withColumn("rn", row_number().over(
        Window.partitionBy("key").orderBy(col("score").desc, col("id"))))
      .filter(col("rn") <= 5).drop("rn")
      .collect().map(_.toSeq).toSet
    assert(viaOp === viaWindow)
    assert(viaOp.size === 200) // 40 keys × 5
  }

  test("plans as partial + final heap stages with one exchange, no window sort") {
    val plan = TopKPerKey(data, Seq("key"), Seq(("score", false), ("id", true)), 5)
      .queryExecution.executedPlan.toString
    assert("TopKPerKey ".r.findAllIn(plan).size >= 2, s"missing stage:\n$plan")
    assert(plan.contains("Exchange hashpartitioning"), s"no key shuffle:\n$plan")
    assert(!plan.contains("Window"), s"fell back to a window:\n$plan")
  }

  test("k >= group size returns whole groups, in requested order within key") {
    val small = Seq((1L, 10.0), (1L, 30.0), (1L, 20.0), (2L, 5.0))
      .toDF("key", "score")
    val out = TopKPerKey(small, Seq("key"), Seq(("score", false)), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.filter(_._1 == 1L).map(_._2).toSeq === Seq(30.0, 20.0, 10.0))
    assert(out.count(_._1 == 2L) === 1)
  }

  test("composes under further transforms (filter above, projection below)") {
    val filtered = data.filter(col("id") % 2 === 0).select("key", "id", "score")
    val viaOp = TopKPerKey(filtered, Seq("key"), Seq(("score", false), ("id", true)), 3)
      .groupBy("key").count().collect().map(r => r.getLong(1)).toSet
    assert(viaOp === Set(3L))
  }

  test("declarative row_number pattern rewrites to the heap operator when enabled") {
    spark.conf.set(TopKWindowRewrite.CONF, "true")
    try {
      val df = data
        .withColumn("rn", row_number().over(
          Window.partitionBy("key").orderBy(col("score").desc, col("id"))))
        .filter(col("rn") <= 5).drop("rn")
      val plan = df.queryExecution.executedPlan.toString
      assert("TopKPerKey ".r.findAllIn(plan).size >= 2 && !plan.contains("Window"),
        s"pattern not rewritten:\n$plan")
      val viaOp = TopKPerKey(data, Seq("key"), Seq(("score", false), ("id", true)), 5)
        .collect().map(_.toSeq).toSet
      assert(df.collect().map(_.toSeq).toSet === viaOp)
    } finally spark.conf.unset(TopKWindowRewrite.CONF)
  }

  test("rank consumed downstream: the window stays (rewrite would lose rn)") {
    spark.conf.set(TopKWindowRewrite.CONF, "true")
    try {
      val df = data
        .withColumn("rn", row_number().over(
          Window.partitionBy("key").orderBy(col("score").desc, col("id"))))
        .filter(col("rn") <= 5) // rn kept in the output
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("Window"), s"rewrite dropped a consumed rank:\n$plan")
    } finally spark.conf.unset(TopKWindowRewrite.CONF)
  }

  test("rewrite-on leaves the existing salted top-k and quota gates bit-identical") {
    // the two production plans whose row_number stages match the rewrite
    // pattern (SCALE.md "Rewrite reach") — their ordering is total, so the
    // heap must select exactly the same rows the window did
    val names = Seq("q_knn_bruteforce", "q_ann_srp", "q_source_cap")
    val dir = "/root/testdata/sf0.001"
    val off = names.map(n =>
      n -> graft.SparkEntry.queries(n)(spark, dir).collect().map(_.toSeq).toSet).toMap
    spark.conf.set(TopKWindowRewrite.CONF, "true")
    try names.foreach { n =>
      val on = graft.SparkEntry.queries(n)(spark, dir).collect().map(_.toSeq).toSet
      assert(on === off(n), s"$n changed under the top-k rewrite")
      assert(on.nonEmpty)
    } finally spark.conf.unset(TopKWindowRewrite.CONF)
  }

  test("unknown column fails loudly") {
    val e = intercept[RuntimeException] {
      TopKPerKey(data, Seq("nope"), Seq(("score", false)), 3)
    }
    assert(e.getMessage.contains("nope"))
  }
}
