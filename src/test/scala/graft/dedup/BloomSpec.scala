package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Bloom membership screen: no false negatives, deterministic positions,
  * and the zero-shuffle broadcast probe ≡ the word-axis probe join.
  */
class BloomSpec extends SparkTestBase {
  import spark.implicits._

  private val M = 1 << 12 // 4096 bits, 128 words
  private val K = 5

  private def fp(c: String) = md5(col(c))

  test("no false negatives: every base member hits its own bitmap") {
    val base = (0 until 200).map(i => s"doc body $i").toDF("text")
    val bits = Bloom.bitmap(base, fp("text"), M, K)
    val words = Bloom.collectWords(bits, M)
    val probe = base.withColumn("id", monotonically_increasing_id())
    val hits = Bloom.probeBroadcast(words, probe, fp("text"), M, K)
    assert(hits.filter(!col("bloom_hit")).count() === 0)
  }

  test("probeBroadcast and probeJoin agree row-for-row") {
    val base = (0 until 150).map(i => s"base $i").toDF("text")
    val bits = Bloom.bitmap(base, fp("text"), M, K)
    val words = Bloom.collectWords(bits, M)
    val probe = (0 until 300).map(i => (i.toLong, s"base ${i * 7 % 400}")).toDF("id", "text")
    val a = Bloom.probeBroadcast(words, probe, fp("text"), M, K)
      .select("id", "bloom_hit")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val b = Bloom.probeJoin(bits, probe, "id", fp("text"), M, K)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getBoolean(1)))
    assert(a.sameElements(b))
  }

  test("bitmap word axis is bounded by m/32 and uses only the low 32 bits") {
    val base = (0 until 500).map(i => s"x$i").toDF("text")
    val rows = Bloom.bitmap(base, fp("text"), M, K).collect()
    assert(rows.length <= M / Bloom.WORD_BITS)
    rows.foreach { r =>
      assert(r.getInt(0) >= 0 && r.getInt(0) < M / Bloom.WORD_BITS)
      assert((r.getLong(1) >>> 32) === 0L, "word touched beyond bit 31")
    }
  }

  test("non-member probes mostly miss at the sized-for FP rate") {
    val base = (0 until 100).map(i => s"member $i").toDF("text")
    val words = Bloom.collectWords(Bloom.bitmap(base, fp("text"), M, K), M)
    val probe = (0 until 500).map(i => (i.toLong, s"outsider $i")).toDF("id", "text")
    val fpCount = Bloom.probeBroadcast(words, probe, fp("text"), M, K)
      .filter(col("bloom_hit")).count()
    // n=100, m=4096, k=5 → theoretical FP ≈ 3e-5; allow generous slack
    assert(fpCount <= 5, s"false-positive count $fpCount implausibly high")
  }
}
