package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class Scd2Spec extends SparkTestBase {
  private lazy val sp = spark
  import sp.implicits._

  // capture log for one URL: value b repeats (collapses), then changes back
  private def history() = {
    val captures = Seq(
      ("u1", 10L, "a", 1L),
      ("u1", 20L, "b", 2L),
      ("u1", 30L, "b", 3L), // no-op re-crawl — must collapse
      ("u1", 40L, "a", 4L),
      ("u2", 15L, "x", 5L)
    ).toDF("url", "ts", "content", "id")
    Scd2.buildHistory(captures, "url", "ts", "content", "id")
  }

  test("hand-built log: collapse, intervals, versions, open current") {
    val got = history()
      .select("url", "version", "effective_from", "effective_to", "content")
      .as[(String, Int, Long, Option[Long], String)].collect().toSet
    assert(got == Set(
      ("u1", 1, 10L, Some(20L), "a"),
      ("u1", 2, 20L, Some(40L), "b"), // the 30L re-crawl vanished; b runs 20-40
      ("u1", 3, 40L, None, "a"),      // back-to-a is a NEW version, not a merge
      ("u2", 1, 15L, None, "x")))
  }

  test("asOf returns exactly the version valid at a timestamp") {
    val h = history()
    def at(url: String, ts: Long): Seq[String] =
      Scd2.asOf(h.filter(col("url") === url), lit(ts))
        .select("content").as[String].collect().toSeq
    assert(at("u1", 10L) == Seq("a"))
    assert(at("u1", 25L) == Seq("b"))
    assert(at("u1", 39L) == Seq("b"))
    assert(at("u1", 40L) == Seq("a"))
    assert(at("u1", 1000L) == Seq("a")) // open current version
    assert(at("u1", 5L).isEmpty)        // before first capture
  }

  test("ts ties break on the tie column — total order, layout-independent") {
    val captures = Seq(
      ("u", 10L, "first", 1L),
      ("u", 10L, "second", 2L)
    ).toDF("url", "ts", "content", "id")
    val got = Scd2.buildHistory(captures, "url", "ts", "content", "id")
      .select("version", "content").as[(Int, String)].collect().toSet
    assert(got == Set((1, "first"), (2, "second")))
    val repartitioned = Scd2.buildHistory(captures.repartition(7), "url", "ts", "content", "id")
      .select("version", "content").as[(Int, String)].collect().toSet
    assert(repartitioned == got)
  }

  test("null attribute values compare null-safely") {
    val captures = Seq(
      ("u", 1L, null, 1L), ("u", 2L, null, 2L), ("u", 3L, "v", 3L)
    ).toDF("url", "ts", "content", "id")
    val got = Scd2.buildHistory(captures, "url", "ts", "content", "id")
      .select("version", "content").as[(Int, Option[String])].collect().toSet
    // the two null captures collapse into one version
    assert(got == Set((1, None), (2, Some("v"))))
  }

  test("both windows share one exchange on the key") {
    val captures = (0 until 100).map(i => (s"u${i % 10}", i.toLong, s"c${i % 3}", i.toLong))
      .toDF("url", "ts", "content", "id")
    val plan = Scd2.buildHistory(captures, "url", "ts", "content", "id")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected one key exchange, plan:\n$plan")
  }
}
