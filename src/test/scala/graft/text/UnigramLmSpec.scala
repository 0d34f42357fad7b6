package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class UnigramLmSpec extends SparkTestBase {
  private lazy val sp = spark
  import sp.implicits._

  private def probsOf(m: Map[String, Long]) = m.toSeq.toDF("piece", "lp")

  private def segment(words: Seq[(String, Long)], probs: Map[String, Long],
      maxLen: Int = 4): Map[String, (String, Int, Long)] =
    UnigramLm.viterbiSegment(words.toDF("word", "freq"), probsOf(probs), maxLen)
      .select("word", "seg", "n_pieces", "score_scaled")
      .as[(String, String, Int, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("viterbi picks the higher-probability segmentation (hand-computed)") {
    // "abc": a+bc = -10 + -12 = -22; ab+c = -11 + -15 = -26; abc = -20;
    // a+b+c = -10-14-15 = -39 → best is the whole piece 'abc' at -20
    val probs = Map("a" -> -10L, "b" -> -14L, "c" -> -15L,
      "ab" -> -11L, "bc" -> -12L, "abc" -> -20L)
    val got = segment(Seq(("abc", 3L)), probs)
    assert(got("abc") == (("abc", 1, -20L)))
    // remove 'abc' from the vocab: best becomes a|bc at -22
    val got2 = segment(Seq(("abc", 3L)), probs - "abc")
    assert(got2("abc") == (("a|bc", 2, -22L)))
  }

  test("ties break to the longest piece ending at the position (smallest start)") {
    // both x+yz and xy+z score -20; the rule picks the span with the
    // smaller START for the final position: x|yz (start 1) over xy|z
    // (start 2)
    val probs = Map("x" -> -10L, "y" -> -99L, "z" -> -10L,
      "xy" -> -10L, "yz" -> -10L)
    val got = segment(Seq(("xyz", 1L)), probs)
    assert(got("xyz")._3 == -20L)
    assert(got("xyz")._1 == "x|yz")
  }

  test("singles closure: an unseen word still segments through characters") {
    val words = Seq(("zq", 1L))
    val probs = Map("z" -> -30L, "q" -> -31L)
    val got = segment(words, probs)
    assert(got("zq") == (("z|q", 2, -61L)))
  }

  test("seedPieces counts substring occurrences weighted by word frequency") {
    val words = Seq(("aa", 5L), ("ab", 2L)).toDF("word", "freq")
    val got = UnigramLm.seedPieces(words, maxPieceLen = 2, topV = 100)
      .as[(String, Long)].collect().toMap
    // 'a': twice in "aa" (5 each) + once in "ab" (2) = 12
    assert(got("a") == 12L)
    assert(got("b") == 2L)
    assert(got("aa") == 5L)
    assert(got("ab") == 2L)
  }

  test("topV cap keeps all singles regardless of count") {
    val words = (0 until 50).map(i => (s"w$i", 100L)) :+ (("zz", 1L))
    val got = UnigramLm.seedPieces(words.toDF("word", "freq"), 2, topV = 3)
      .as[(String, Long)].collect().toMap
    assert(got.contains("z")) // single survives despite tiny count
    assert(got.keys.filter(_.length > 1).size <= 3)
  }

  test("expectedCounts aggregates Viterbi pieces by word frequency") {
    val segs = Seq(("ab", 3L, "a|b"), ("aba", 2L, "a|b|a"))
      .toDF("word", "freq", "seg")
    val got = UnigramLm.expectedCounts(segs).as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 7L, "b" -> 5L))
  }

  test("encodePerDoc: per-doc subword counts from the word-keyed join") {
    val docs = Seq((1L, "ab ab c"), (2L, "c")).toDF("doc_id", "text")
    val segs = Seq(("ab", 2L, "a|b", 2, -5L), ("c", 2L, "c", 1, -3L))
      .toDF("word", "freq", "seg", "n_pieces", "score_scaled")
    val got = UnigramLm.encodePerDoc(docs, "doc_id", col("text"), segs)
      .as[(Long, Long, Long)].collect()
      .map { case (id, w, s) => id -> ((w, s)) }.toMap
    assert(got == Map(1L -> ((3L, 5L)), 2L -> ((1L, 1L))))
  }

  test("EM loop: later iterations stay total, deterministic, and never worsen corpus NLL") {
    val docs = Seq((1L, "low lower lowest low low"), (2L, "new newer newest new"))
      .toDF("doc_id", "text")
    def nll(segs: org.apache.spark.sql.DataFrame): Long =
      -segs.select(sum(col("freq") * col("score_scaled"))).as[Long].head()
    val one = UnigramLm.emSteps(docs, col("text"), 4, 30, iters = 1)
    val three = UnigramLm.emSteps(docs, col("text"), 4, 30, iters = 3)
    val s3 = three.select("word", "seg").as[(String, String)].collect().toMap
    s3.foreach { case (w, seg) => assert(seg.split("\\|").mkString == w) }
    // hard-EM re-estimation concentrates mass on used pieces — the toy
    // corpus NLL must not get worse (scores are exact scaled integers)
    assert(nll(three) <= nll(one))
    val again = UnigramLm.emSteps(docs, col("text"), 4, 30, iters = 3)
      .collect().toSet
    assert(again == three.collect().toSet)
  }

  test("full EM step on a toy corpus is deterministic and segments every word") {
    val docs = Seq((1L, "low lower lowest low low"), (2L, "new newer newest new"))
      .toDF("doc_id", "text")
    val (segs, counts) = UnigramLm.emStep(docs, col("text"), maxPieceLen = 4, topV = 30)
    val s = segs.select("word", "seg").as[(String, String)].collect().toMap
    assert(s.keySet == Set("low", "lower", "lowest", "new", "newer", "newest"))
    // every segmentation reassembles its word
    s.foreach { case (w, seg) => assert(seg.split("\\|").mkString == w) }
    // frequent whole words should be kept whole ('low' appears 3x as a
    // 3-char substring candidate with high count)
    assert(s("low") == "low")
    val c = counts.as[(String, Long)].collect().toMap
    assert(c.values.forall(_ > 0))
    // rerun is bit-identical (determinism)
    val (segs2, _) = UnigramLm.emStep(docs, col("text"), maxPieceLen = 4, topV = 30)
    assert(segs2.collect().toSet == segs.collect().toSet)
  }
}
