package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SnapshotDiffSpec extends SparkTestBase {
  private lazy val sp = spark
  import sp.implicits._

  test("diff classifies added / removed / changed / unchanged") {
    val a = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("id", "text")
    val b = Seq((2L, "beta"), (3L, "gamma-edited"), (4L, "delta")).toDF("id", "text")
    val got = SnapshotDiff.diff(a, b, "id", SnapshotDiff.fingerprint(Seq("text")))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
  }

  test("fingerprint is null-safe and separator-safe") {
    // null vs empty string must differ; ("ab","c") vs ("a","bc") must differ
    val x = Seq((1L, null.asInstanceOf[String], "c"), (2L, "", "c"))
      .toDF("id", "u", "v")
    val fps = x.select(SnapshotDiff.fingerprint(Seq("u", "v"))(x).as("fp"))
      .as[String].collect()
    assert(fps.distinct.length == 2)
    val y = Seq((1L, "ab", "c"), (2L, "a", "bc")).toDF("id", "u", "v")
    val fy = y.select(SnapshotDiff.fingerprint(Seq("u", "v"))(y).as("fp"))
      .as[String].collect()
    assert(fy.distinct.length == 2)
  }

  test("only keys and fingerprints cross the join — payload columns are pruned from both scans") {
    val a = Seq((1L, "alpha", "x")).toDF("id", "text", "extra")
    val b = Seq((1L, "alpha", "y")).toDF("id", "text", "extra")
    val d = SnapshotDiff.diff(a, b, "id", SnapshotDiff.fingerprint(Seq("text")))
    // the full-outer join's children project only (id, fingerprint)
    val joins = d.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.nonEmpty)
    for (j <- joins; side <- Seq(j.left, j.right))
      assert(side.output.length == 2,
        s"join side carries ${side.output.map(_.name)} — payload not reduced pre-join")
  }
}
