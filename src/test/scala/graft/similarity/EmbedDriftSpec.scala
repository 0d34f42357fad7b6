package graft.similarity

import graft.SparkTestBase

class EmbedDriftSpec extends SparkTestBase {
  import spark.implicits._

  private def df(rows: (Long, String, Array[Float])*) =
    rows.toDF("vec_id", "label", "embedding")

  test("shift is the L2 distance between 6-dp-pinned per-dimension means") {
    val a = df((0L, "x", Array(1f, 0f)), (1L, "x", Array(3f, 0f)),
      (2L, "y", Array(0f, 1f)))
    val b = df((3L, "x", Array(2f, 2f)), (4L, "y", Array(0f, 1f)))
    val out = EmbedDrift.meanShift(a, b, "label", "embedding")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // x: mean_a = (2, 0), mean_b = (2, 2) → shift 2; y: identical → 0
    assert(out("x") == ((2L, 1L, 2.0)))
    assert(out("y") == ((1L, 1L, 0.0)))
  }

  test("groups present on only one side drop out (inner join semantics)") {
    val a = df((0L, "only_a", Array(1f, 0f)))
    val b = df((1L, "only_b", Array(1f, 0f)))
    assert(EmbedDrift.meanShift(a, b, "label", "embedding").collect().isEmpty)
  }

  test("shift is symmetric") {
    val a = df((0L, "g", Array(1f, 2f, 3f)))
    val b = df((1L, "g", Array(4f, 6f, 3f)))
    val ab = EmbedDrift.meanShift(a, b, "label", "embedding").collect().head.getDouble(3)
    val ba = EmbedDrift.meanShift(b, a, "label", "embedding").collect().head.getDouble(3)
    assert(ab == ba && ab == 5.0) // sqrt(9 + 16 + 0)
  }
}
