package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Paragraph-granularity exact dedup: within-doc first-occurrence, global
  * first-occurrence ownership, order preservation, and the zero-shuffle
  * plan shape of the row-local variant.
  */
class ParagraphDedupSpec extends SparkTestBase {
  import spark.implicits._

  // paraTokens = 2 keeps fixtures readable: paragraphs are word pairs
  private val W = 2

  test("intraDocDedup keeps the first copy of a repeated paragraph, in order") {
    val docs = Seq(
      (1L, "a b c d a b e f"), // para "a b" repeats at pos 2
      (2L, "x y x y x y"),     // all three paragraphs identical
      (3L, "p q r s")          // no repeats
    ).toDF("doc_id", "text")
    val out = ParagraphDedup.intraDocDedup(docs, "doc_id", "text", W)
      .orderBy("id").collect()
    assert(out(0).getString(1) === "a b c d e f")
    assert((out(0).getInt(2), out(0).getInt(3)) === (4, 3))
    assert(out(1).getString(1) === "x y")
    assert((out(1).getInt(2), out(1).getInt(3)) === (3, 1))
    assert(out(2).getString(1) === "p q r s")
    assert((out(2).getInt(2), out(2).getInt(3)) === (2, 2))
  }

  test("intraDocDedup is a single row-local stage — no shuffle in the plan") {
    val docs = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val plan = ParagraphDedup.intraDocDedup(docs, "doc_id", "text", W)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("corpusDedup: globally-first (doc, pos) occurrence wins across docs") {
    val docs = Seq(
      (1L, "a b c d"),   // owns "a b" and "c d"
      (2L, "c d e f"),   // loses "c d" to doc 1, keeps "e f"
      (3L, "a b c d"),   // exact dup of doc 1 — fully removed
      (4L, "g h a b g h") // loses "a b"; first "g h" survives, second removed
    ).toDF("doc_id", "text")
    val out = ParagraphDedup.corpusDedup(docs, "doc_id", "text", W)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3)))
    assert(out === Array(
      (1L, "a b c d", 2, 2),
      (2L, "e f", 2, 1),
      (3L, "", 2, 0),
      (4L, "g h", 3, 1)))
  }

  test("corpusDedup raises on POS_BASE paragraph-count overflow") {
    val words = (0 until 200001 * W).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, words)).toDF("doc_id", "text")
    val e = intercept[Exception] {
      ParagraphDedup.corpusDedup(docs, "doc_id", "text", W).collect()
    }
    assert(e.getMessage.contains("POS_BASE"))
  }

  test("screenedIncrement = exact anti-join screen; FP-heavy bitmap changes nothing") {
    val base = Seq((1L, "a b c d"), (2L, "e f g h")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "a b x y"),   // "a b" seen in base -> removed, "x y" kept
      (15L, "c d e f"),   // fully seen -> empty
      (20L, "p q r s")    // fully new -> passthrough
    ).toDF("doc_id", "text")
    def run(m: Int) = ParagraphDedup.screenedIncrement(base, batch,
        "doc_id", "text", paraTokens = W, mBits = m, k = 3)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3)))
    val expected = Array(
      (10L, "x y", 2, 1),
      (15L, "", 2, 0),
      (20L, "p q r s", 2, 2))
    assert(run(1 << 12) === expected)
    // 64-bit bitmap: nearly every probe is a false positive — the exact
    // verify join must reject them all, output unchanged
    assert(run(64) === expected)
  }

  test("short terminal paragraph participates like any other") {
    val docs = Seq((1L, "a b c"), (2L, "c")).toDF("doc_id", "text")
    val out = ParagraphDedup.corpusDedup(docs, "doc_id", "text", W)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3)))
    // doc 1's terminal short para is "c"; doc 2's whole text is the same "c"
    assert(out === Array((1L, "a b c", 2, 2), (2L, "", 1, 0)))
  }
}
