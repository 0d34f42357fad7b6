package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkTestBase {
  private lazy val sp = spark
  import sp.implicits._

  private def interleaveRef(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    for (b <- 0 until bits) {
      z |= ((x >> b) & 1L) << (2 * b)
      z |= ((y >> b) & 1L) << (2 * b + 1)
    }
    z
  }

  test("zValue matches the hand interleave on exhaustive 4-bit pairs") {
    val pairs = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val got = pairs.toDF("x", "y")
      .withColumn("z", ZOrder.zValue(Seq(col("x"), col("y")), 4))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z == interleaveRef(x, y, 4), s"($x,$y)") }
    // z-values over the full grid are a permutation of 0..255
    assert(got.map(_._3).sorted.toSeq == (0L until 256L).toSeq)
  }

  test("quantize maps endpoints to 0 and 2^bits-1, monotone in between") {
    val df = (0L to 100L).toDF("c")
      .withColumn("q", ZOrder.quantize(col("c"), lit(0L), lit(100L), 6))
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(df.head._2 == 0L && df.last._2 == 63L)
    assert(df.sliding(2).forall { case Array(a, b) => a._2 <= b._2 })
    assert(df.forall { case (_, q) => q >= 0 && q <= 63 })
  }

  test("tiles are axis-aligned boxes: a 2D box query touches fewer tiles than a 1D-sorted layout") {
    // full 64x64 grid, 12-bit z, 16 tiles (top 2 bits of each dimension)
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)).toDF("x", "y")
      .withColumn("z", ZOrder.zValue(Seq(col("x"), col("y")), 6))
      .withColumn("tile", ZOrder.tile(col("z"), 12, 4))
    val boxes = grid.groupBy("tile")
      .agg(min("x").as("x0"), max("x").as("x1"), min("y").as("y0"), max("y").as("y1"),
        count(lit(1)).as("n"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(boxes.length == 16)
    // every tile is a 16x16 box with 256 cells — tight on BOTH dimensions
    boxes.foreach { case (t, x0, x1, y0, y1, n) =>
      assert(x1 - x0 == 15 && y1 - y0 == 15 && n == 256, s"tile $t")
    }
    // the box query x,y in [0,7]^2 overlaps exactly ONE z-tile; under a
    // 1D x-sorted 16-bucket layout each bucket is a 4-wide full-height
    // stripe, so the same query overlaps TWO buckets and each stripe's
    // y-range is the whole domain (no pruning on y at all)
    val zTouched = boxes.count { case (_, x0, x1, y0, y1, _) =>
      x0 <= 7 && x1 >= 0 && y0 <= 7 && y1 >= 0 }
    assert(zTouched == 1)
    val stripes = (0 until 16).map(b => (b * 4L, b * 4L + 3L, 0L, 63L))
    val linTouched = stripes.count { case (x0, x1, y0, y1) =>
      x0 <= 7 && x1 >= 0 && y0 <= 7 && y1 >= 0 }
    assert(linTouched == 2)
  }

  test("layout clusters each tile into one partition, z-sorted within") {
    val grid = (for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)).toDF("x", "y")
    val z = ZOrder.zValue(Seq(col("x"), col("y")), 5)
    val laid = ZOrder.layout(grid, z, 10, 2)
    val perPart = laid.rdd.mapPartitions { it =>
      val rows = it.map(r => (r.getAs[Long]("__tile"), r.getAs[Long]("__z"))).toSeq
      Iterator.single((rows.map(_._1).distinct, rows.map(_._2)))
    }.collect()
    val nonEmpty = perPart.filter(_._2.nonEmpty)
    // hash-partitioned by tile: every non-empty partition holds whole tiles
    assert(nonEmpty.flatMap(_._1).sorted.toSeq == (0L until 4L).toSeq)
    nonEmpty.foreach { case (_, zs) => assert(zs == zs.sorted) }
  }
}
