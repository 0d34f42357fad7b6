package graft.text

import graft.SparkTestBase

class ChunkingSpec extends SparkTestBase {
  import spark.implicits._

  private def doc(id: Long, n: Int) =
    (id, (0 until n).map(i => s"t$i").mkString(" "))

  test("windows advance by stride and share overlap tokens; last chunk may be short") {
    val df = Seq(doc(0L, 10)).toDF("doc_id", "text")
    val out = Chunking.chunkDocs(df, "doc_id", "text", chunkSize = 4, overlap = 1)
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
      .sortBy(_._1)
    // stride 3: starts 0,3,6,9 → ceil((10-1)/3)=3 chunks... (10-1+2)//3 = 3
    assert(out.map(_._2).toSeq == Seq(0, 3, 6))
    assert(out(0)._4 == "t0 t1 t2 t3")
    assert(out(1)._4 == "t3 t4 t5 t6") // t3 shared — the overlap
    assert(out(2)._4 == "t6 t7 t8 t9")
    assert(out.map(_._3).toSeq == Seq(4, 4, 4))
  }

  test("short doc yields exactly one (possibly partial) chunk; every token covered") {
    val df = Seq(doc(0L, 3), doc(1L, 64), doc(2L, 65)).toDF("doc_id", "text")
    val out = Chunking.chunkDocs(df, "doc_id", "text", chunkSize = 64, overlap = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(3)))
    assert(out.count(_._1 == 0L) == 1 && out.find(_._1 == 0L).get._3 == 3)
    assert(out.count(_._1 == 1L) == 1) // exactly chunkSize → one chunk
    val c2 = out.filter(_._1 == 2L).sortBy(_._2)
    assert(c2.length == 2 && c2(0)._3 == 64 && c2(1)._3 == 17) // 65th token + 16 overlap
  }

  test("zero overlap tiles the stream exactly; coverage is a partition") {
    val df = Seq(doc(0L, 100)).toDF("doc_id", "text")
    val out = Chunking.chunkDocs(df, "doc_id", "text", chunkSize = 32, overlap = 0)
      .collect().map(r => (r.getInt(2), r.getInt(3))).sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(0, 32, 64, 96))
    assert(out.map(_._2).sum == 100)
  }

  test("invalid overlap is rejected") {
    val df = Seq(doc(0L, 5)).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Chunking.chunkDocs(df, "doc_id", "text", chunkSize = 4, overlap = 4)
    }
  }

  test("property: the chunk-count arithmetic covers every token (300 random configs, pure math)") {
    // the same integer formula the operator and the oracle share:
    // nch = max((n - overlap + stride - 1) DIV stride, 1), starts = i·stride
    val rng = new scala.util.Random(11)
    for (_ <- 0 until 300) {
      val n = rng.nextInt(500) + 1
      val chunkSize = rng.nextInt(64) + 1
      val overlap = rng.nextInt(chunkSize)
      val stride = chunkSize - overlap
      val nch = math.max((n - overlap + stride - 1) / stride, 1)
      val starts = (0 until nch).map(_ * stride)
      assert((0 until n).forall(t => starts.exists(s => t >= s && t < s + chunkSize)),
        s"uncovered token: n=$n size=$chunkSize overlap=$overlap")
      // minimality: dropping the last chunk must uncover something,
      // except the degenerate single-chunk case
      if (nch > 1)
        assert(!(0 until n).forall(t =>
          starts.dropRight(1).exists(s => t >= s && t < s + chunkSize)),
          s"last chunk redundant: n=$n size=$chunkSize overlap=$overlap")
    }
  }
}
