package graft.text

import graft.SparkTestBase

case class SftTurn(role: String, content: String)

class SftLintSpec extends SparkTestBase {
  import spark.implicits._

  private def conv(turns: (String, String)*): Seq[SftTurn] =
    turns.map { case (r, c) => SftTurn(r, c) }

  private def lint(convs: Seq[(Long, Seq[SftTurn])], minTurns: Int = 2) = {
    val df = convs.toDF("id", "conv")
    SftLint.lint(df, "id", "conv", minTurns)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5),
          r.getInt(6), r.getInt(7), r.getInt(8))))
      .toMap
  }

  test("a clean user/assistant dialogue passes every check") {
    val out = lint(Seq(0L -> conv("user" -> "hi", "assistant" -> "hello",
      "user" -> "more", "assistant" -> "sure")))
    assert(out(0L) == ((4, 1, 1, 1, 1, 1, 1, 1)))
  }

  test("each defect class trips exactly its own flag") {
    val out = lint(Seq(
      1L -> conv("assistant" -> "hi", "user" -> "q", "assistant" -> "a"), // starts wrong
      2L -> conv("user" -> "q", "assistant" -> "a", "user" -> "dangling"), // ends wrong
      3L -> conv("user" -> "q", "user" -> "q2", "assistant" -> "a"), // same-role run
      4L -> conv("user" -> "q", "assistant" -> ""), // empty turn
      5L -> conv("user" -> "q", "system" -> "leak", "assistant" -> "a") // mid system
    ))
    // (n, starts, ends, alt, empty, sysmid, enough, valid)
    assert(out(1L) == ((3, 0, 1, 1, 1, 1, 1, 0)))
    assert(out(2L) == ((3, 1, 0, 1, 1, 1, 1, 0)))
    assert(out(3L) == ((3, 1, 1, 0, 1, 1, 1, 0)))
    assert(out(4L) == ((2, 1, 1, 1, 0, 1, 1, 0)))
    assert(out(5L) == ((3, 1, 1, 1, 1, 0, 1, 0)))
  }

  test("a leading system prompt is legal; minTurns gates shorties") {
    val out = lint(Seq(
      0L -> conv("system" -> "be nice", "user" -> "q", "assistant" -> "a"),
      1L -> conv("user" -> "hi")))
    // system-first fails starts_user (chat grammar wants user after the
    // optional system prompt is STRIPPED by the caller) but NOT the
    // mid-dialogue leak check
    assert(out(0L)._6 == 1, "leading system is not a mid-dialogue leak")
    assert(out(0L)._2 == 0)
    assert(out(1L) == ((1, 1, 0, 1, 1, 1, 0, 0)), "single turn: too short, no assistant")
  }

  test("system at the last position is a leak, not an ending defect only") {
    val out = lint(Seq(0L -> conv("user" -> "q", "assistant" -> "a", "system" -> "x")))
    assert(out(0L)._6 == 0)
    assert(out(0L)._3 == 0)
  }

  test("empty conversation survives without NaN/exception and fails validity") {
    val out = lint(Seq(0L -> Seq.empty[SftTurn]))
    assert(out(0L)._1 == 0)
    assert(out(0L)._8 == 0)
  }
}
