package graft.text

import org.apache.spark.sql.functions.col

import graft.SparkTestBase

class HeuristicsSpec extends SparkTestBase {
  import spark.implicits._

  // 25 tokens, high diversity, no stopwords beyond one "the", no blocked
  private val good =
    "the quick brown fox jumps over lazy dogs while seven wizards brew " +
      "potent elixirs under ancient oaks near silver rivers flowing toward " +
      "distant misty mountains"

  test("flags isolate the violated rule; keep is the conjunction") {
    val docs = Seq(
      (1L, good), // passes all
      (2L, "too short"), // f_len = 0
      (3L, Seq.fill(30)("rep").mkString(" ")), // f_ttr = 0 (1/30 distinct)
      (4L, Seq.fill(25)("a b").mkString(" ") + " x"), // stop-heavy, short toks
      (5L, good + " visit javascript dot com") // blocklist
    ).toDF("doc_id", "text")

    val out = Heuristics.flags(docs, "doc_id", "text")
      .orderBy("doc_id").collect()

    assert(out(0).toSeq.drop(1) === Seq(1, 1, 1, 1, 1, 1))
    assert(out(1).getAs[Int]("f_len") === 0 && out(1).getAs[Int]("keep") === 0)
    assert(out(2).getAs[Int]("f_ttr") === 0 && out(2).getAs[Int]("keep") === 0)
    assert(out(3).getAs[Int]("f_stop") === 0 && out(3).getAs[Int]("keep") === 0)
    assert(out(4).getAs[Int]("f_blocklist") === 0 && out(4).getAs[Int]("keep") === 0)
  }

  test("terminal-punct rule is opt-in and matches trailing sentence enders") {
    val docs = Seq((1L, good + "."), (2L, good + "  "), (3L, good + "!"))
      .toDF("doc_id", "text")
    val b = Heuristics.Bounds(requireTerminalPunct = true)
    val out = Heuristics.flags(docs, "doc_id", "text", b = b)
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[Int]("f_terminal")).toSeq === Seq(1, 0, 1))
    assert(out.map(_.getAs[Int]("keep")).toSeq === Seq(1, 0, 1))
  }

  test("survival aggregates keep per group without a second scan of text") {
    val docs = Seq(
      (1L, good, "web"), (2L, "too short", "web"),
      (3L, good, "books"))
      .toDF("doc_id", "text", "source")
    val out = Heuristics.survival(docs, "text", "source")
      .orderBy("source").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq(("books", 1L, 1L), ("web", 2L, 1L)))
    assert(out(1).getAs[Double]("keep_rate") === 0.5)
  }

  test("filter fuses into one codegen stage — no shuffle in the plan") {
    val docs = Seq((1L, good)).toDF("doc_id", "text")
    val plan = Heuristics.flags(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
