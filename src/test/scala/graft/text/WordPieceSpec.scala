package graft.text

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Greedy longest-match WordPiece: hand segmentations, the greedy-vs-
  * Viterbi commitment difference, UNK advance, reconstruction, and usage
  * aggregation.
  */
class WordPieceSpec extends SparkTestBase {
  import spark.implicits._

  private def vocabDf(ps: String*) = ps.map(p => (p, 1L)).toDF("piece", "cnt")

  private def segment(words: Seq[(String, Long)], vocab: Seq[String],
      maxLen: Int = 4): Map[String, Seq[String]] =
    WordPiece.greedySegment(words.toDF("word", "freq"), vocabDf(vocab: _*), maxLen)
      .select("word", "pieces").as[(String, Seq[String])].collect().toMap

  test("longest match wins at each position") {
    val segs = segment(Seq(("abab", 2L), ("abc", 1L)),
      Seq("a", "b", "ab", "abc"))
    assert(segs("abab") == Seq("ab", "ab"))
    assert(segs("abc") == Seq("abc"))
  }

  test("greedy commits even when Viterbi would do better") {
    // vocab {ab, cd, abc}: greedy on "abcd" takes abc then UNK(d);
    // the optimal 2-piece ab+cd is NOT taken — the WordPiece contract.
    val segs = segment(Seq(("abcd", 1L)), Seq("ab", "cd", "abc"))
    assert(segs("abcd") == Seq("abc", WordPiece.UNK))
  }

  test("unmatchable position emits [UNK] and advances one character") {
    val segs = segment(Seq(("axb", 1L)), Seq("a", "b"))
    assert(segs("axb") == Seq("a", WordPiece.UNK, "b"))
    // word with no matches at all: every position is UNK
    val none = segment(Seq(("zzz", 1L)), Seq("a"))
    assert(none("zzz") == Seq(WordPiece.UNK, WordPiece.UNK, WordPiece.UNK))
  }

  test("fully-matched pieces reconstruct the word; maxPieceLen caps matches") {
    val segs = segment(Seq(("aaaaaa", 1L)), Seq("a", "aa", "aaa", "aaaa", "aaaaa"),
      maxLen = 3)
    assert(segs("aaaaaa") == Seq("aaa", "aaa")) // 4+ never considered
    val r = segment(Seq(("banana", 1L)), Seq("ba", "na", "n", "a"))
    assert(r("banana").mkString == "banana")
  }

  test("usage stats weight by word frequency and count distinct words") {
    val segmented = WordPiece.greedySegment(
      Seq(("abab", 3L), ("ab", 2L)).toDF("word", "freq"),
      vocabDf("ab"), 4)
    // "ab" used twice in abab (freq 3) and once in ab (freq 2): 2*3+1*2 = 8
    val row = WordPiece.usageStats(segmented, 10).collect().head
    assert(row.getString(0) == "ab" && row.getLong(1) == 2L && row.getLong(2) == 8L)
  }

  test("match-length table is the broadcast-join shape, walk is codegen") {
    val words = (1 to 50).map(i => (s"w${i}ab", 1L)).toDF("word", "freq")
    val seg = WordPiece.greedySegment(words, vocabDf("a", "b", "ab", "w"), 4)
    val plan = seg.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("BatchEval"), s"UDF node present:\n$plan")
  }
}
