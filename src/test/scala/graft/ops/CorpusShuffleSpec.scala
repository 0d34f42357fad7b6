package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class CorpusShuffleSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus(n: Int) = (0L until n.toLong).toDF("doc_id")

  test("positions are an exact permutation of 0..N-1") {
    val pos = CorpusShuffle.shufflePositions(corpus(500), "doc_id", nBuckets = 16)
      .select("shuffle_pos").as[Long].collect().sorted
    assert(pos.toSeq == (0L until 500L))
  }

  test("deterministic across runs and physical layouts") {
    def run(parts: Int) =
      CorpusShuffle.shufflePositions(corpus(300).repartition(parts), "doc_id", nBuckets = 8)
        .select("doc_id", "shuffle_pos").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(run(3) == run(17))
  }

  test("seed changes the permutation; same seed preserves it") {
    def run(seed: String) =
      CorpusShuffle.shufflePositions(corpus(200), "doc_id", seed = seed, nBuckets = 8)
        .select("doc_id", "shuffle_pos").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(run("a") == run("a"))
    assert(run("a") != run("b"), "different seeds must permute differently")
    // and each seed still yields a permutation
    assert(run("b").map(_._2).sorted == (0L until 200L))
  }

  test("the permutation actually scatters: no long identity run") {
    val pos = CorpusShuffle.shufflePositions(corpus(1000), "doc_id", nBuckets = 32)
      .select("doc_id", "shuffle_pos").as[(Long, Long)].collect().sortBy(_._1)
    val identity = pos.count { case (id, p) => id == p }
    assert(identity < 50, s"$identity of 1000 rows kept their position — not a shuffle")
  }

  test("original columns pass through") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("doc_id", "payload")
    val out = CorpusShuffle.shufflePositions(df, "doc_id", nBuckets = 4)
    assert(out.columns.toSet == Set("doc_id", "payload", "shuffle_pos"))
  }
}
